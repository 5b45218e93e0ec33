"""3D benchmark stepping toward the BASELINE.md north star
(ldc3d [P2+FB]^3-P0 at Re=5000): times the Reynolds sweep at a
single-chip-friendly size and prints one JSON line (same schema as
bench.py; run manually — the driver's bench stays 2D)."""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = [1, 10, 100]


def main(baseN=4, nref=1, k=2):
    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import ThreeDimLidDrivenCavityProblem

    solver = ConstantPressureSolver(
        ThreeDimLidDrivenCavityProblem(baseN), nref=nref, k=k,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)

    solver.solve(1)  # compile warmup
    solver.z = solver.bcset.apply(solver.Z.zero())
    solver.z_last = solver.z
    t0 = time.perf_counter()
    total_lin = total_newton = 0
    for re in RES:
        _, info = solver.solve(re)
        assert info["converged"], f"Re={re} diverged"
        total_lin += info["linear_iter"]
        total_newton += info["nonlinear_iter"]
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"ldc3d_p{k}fb_p0_almg_baseN{baseN}_nref{nref}_re1-100",
        "value": round(elapsed, 3),
        "unit": "s",
        "extra": {
            "ndof": solver.Z.dim,
            "linear_iters": total_lin,
            "newton_iters": total_newton,
            "krylov_per_newton": round(total_lin / max(1, total_newton),
                                       2),
        },
    }))


if __name__ == "__main__":
    main()
