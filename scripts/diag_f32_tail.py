"""One-step f32-cycle precision bisect at the measured failure point.

The f32-gate sweep (checkpoint_f32g) shows the gamma-split f32 cycle
degrading with Re: kpn 3 -> 28.7 over Re 1 -> 700 while the f64 control
sits at ~3-5 (results/README.md).  Hypothesis: the PATCH APPLIES are
the leak — the stored patch factors are cast to f32, and the patch
matrices carry gamma * advection conditioning ~ gamma/nu ~ 7e6 at
Re=700, so f32 applies lose O(1) relative accuracy; the gamma-split
protects only the level matvecs.  This script resumes the Re=600 f32g
checkpoint and solves the SINGLE Re=700 step under each F64-keys mix.

Usage: ALFI_TPU_FORCE_CPU=1 python scripts/diag_f32_tail.py
"""
import os
import sys

os.environ.setdefault("ALFI_TPU_FORCE_CPU", "1")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

CKPT = "results/checkpoint_f32g/41474/nssolution-Re-600.npz"
RE = 700


def run(dt, keep, store=""):
    import numpy as np

    os.environ["ALFI_TPU_MG_DTYPE"] = dt
    os.environ["ALFI_TPU_MG_F64_KEYS"] = keep
    if store:
        os.environ["ALFI_TPU_MG_STORE"] = store
    import alfi_tpu.config as config

    config._mg_dtype = None
    config._mg_store = None
    import jax.numpy as jnp

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(16), nref=2, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        stabilisation_type="supg", restriction=True, verbose=False)
    with np.load(CKPT) as chk:
        s.z = (jnp.asarray(chk["u"]), jnp.asarray(chk["p"]))
    _, info = s.solve(RE)
    print("%-8s keys=%-26s Re=%d lin=%3d non=%d conv=%s"
          % (dt + ("/s" + store if store else ""), keep or "-", RE,
             info["linear_iter"], info["nonlinear_iter"],
             info["converged"]), flush=True)


if __name__ == "__main__":
    mixes = sys.argv[1:] or [
        "f64:",
        "f32:",
        "f32:patch_lufacs",
        "f32:schoeberl",
        "f32:ftensors",
        "f32:tensors,ftensors",
        "f32:patch_lufacs,schoeberl",
    ]
    for mix in mixes:
        head, _, keep = mix.partition(":")
        dt, _, store = head.partition("/")
        # each mix in a subprocess: mg_dtype/key env binds at setup
        if os.environ.get("_DIAG_CHILD") == mix:
            run(dt, keep, store)
            sys.exit(0)
        import subprocess

        env = dict(os.environ, _DIAG_CHILD=mix)
        r = subprocess.run([sys.executable, __file__, mix], env=env,
                           timeout=3600)
        if r.returncode:
            print("mix %s FAILED rc=%d" % (mix, r.returncode),
                  flush=True)
