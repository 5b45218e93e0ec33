"""Iteration-count parity bisect for the f32 MG cycle (config.mg_dtype):
same almg solve with the cycle in f32, sweeping which state components
stay f64 (ALFI_TPU_MG_F64_KEYS), vs the f64 control.  Gate: identical
Newton counts and Krylov counts within ~15% at every Re."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = [1, 100, 500, 1000]


def run(dt, keep="", nref=1):
    import alfi_tpu.config as config

    os.environ["ALFI_TPU_MG_DTYPE"] = dt
    os.environ["ALFI_TPU_MG_F64_KEYS"] = keep
    config._mg_dtype = None
    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(16), nref=nref, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False)
    res = []
    for re in RES:
        _, info = s.solve(re)
        res.append((re, info["nonlinear_iter"], info["linear_iter"],
                    info["converged"]))
        print("%-40s %s" % (dt + ":" + (keep or "-"), res[-1]),
              flush=True)
    return res


if __name__ == "__main__":
    ctrl = run("f64")
    for keep in ["schoeberl", "patch_lufacs", "schoeberl,patch_lufacs",
                 "schoeberl,patch_lufacs,tensors,ftensors", ""]:
        got = run("f32", keep)
        ok = all(x[3] and y[3] and x[1] == y[1]
                 and abs(x[2] - y[2]) <= max(2, 0.15 * x[2])
                 for x, y in zip(ctrl, got))
        print("PARITY %-45s %s" % (keep or "(all f32)",
                                   "OK" if ok else "MISMATCH"),
              flush=True)
