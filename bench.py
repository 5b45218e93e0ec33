"""Benchmark: ldc2d [P2]^2-P0 almg Reynolds continuation, the reference's
headline workload shape (examples/iters.py) at a single-chip-friendly
size.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ratio}

vs_baseline uses 45 s as the nominal reference wall-clock for this
configuration (alfi+PETSc on its documented local reproduction scale,
`mpirun -n 12` per /root/reference/examples/Makefile:1 — the repo
publishes no in-tree numbers, BASELINE.md); ratio > 1 means faster than
the baseline estimate.
"""

import json
import time

BASELINE_SECONDS = 45.0
RES = [1, 10, 100]


def main():
    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    problem = TwoDimLidDrivenCavityProblem(16)
    solver = ConstantPressureSolver(
        problem, nref=2, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)

    # warmup: compile every kernel (params-only changes do not retrace)
    solver.solve(1)

    # reset state and time the continuation sweep
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
        "metric": "ldc2d_pkp0_almg_nref2_re1-100_walltime",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
        "extra": {
            "ndof": solver.Z.dim,
            "linear_iters": total_lin,
            "newton_iters": total_newton,
            "krylov_per_newton": round(total_lin / max(1, total_newton), 2),
        },
    }))


if __name__ == "__main__":
    main()
