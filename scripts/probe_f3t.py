"""Execution bisect for the ldc3d nref=2 on-chip crash (round 5).

The f3t stage compiles now but the TPU worker crashes at the first
chunked-KSP dispatch.  This probe runs the pieces one dispatch at a
time — setup alone, one level matvec, one patch sweep, one FMG cycle,
one full PC apply — printing after each, so the crashing piece is the
last line missing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("ALFI_TPU_GEOM_NUMBERING_3D", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def mark(s, t0=[None]):
    now = time.time()
    if t0[0] is None:
        t0[0] = now
    print(f"[{now - t0[0]:8.1f}s] {s}", flush=True)


def main():
    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import ThreeDimLidDrivenCavityProblem

    mark("construct solver (284k dofs)")
    solver = ConstantPressureSolver(
        ThreeDimLidDrivenCavityProblem(4), nref=2, k=2,
        solver_type="almg", hierarchy="uniform",
        stabilisation_type="supg", patch="star", smoothing=10,
        restriction=True, gamma=1e4, verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 100.0
    params = solver.params()
    vmg = solver.vmg
    static = solver._almg_static
    mark("transfer_setup")
    tstate = solver._transfer_setup(params)
    jax.block_until_ready(tstate)
    mark("setup jit")
    state = jax.jit(
        lambda z, p, ts, st: vmg.setup(z[0], p, schoeberl_state=ts,
                                       static=st, p_fine=z[1])
    )(solver.z, params, tstate, static)
    jax.block_until_ready(state)
    mark("setup DONE")
    L = vmg.nlevels - 1
    lev = vmg.levels[L]
    r = (lev.mask_u * jnp.ones((lev.V.ndof, vmg.d))).astype(jnp.float64)

    out = jax.jit(lambda s, v: vmg.level_apply(
        L, s["tensors"][L], v, ftensors=s["ftensors"][L]))(state, r)
    jax.block_until_ready(out)
    mark("level matvec DONE")

    out = jax.jit(lambda s, v: vmg._smooth(L, s, v, None))(state, r)
    jax.block_until_ready(out)
    mark("smooth DONE")

    out = jax.jit(lambda s, v: vmg.fmg(s, v))(state, r)
    jax.block_until_ready(out)
    mark("fmg cycle DONE")

    mark("residual jit")
    F = solver._residual_jit(solver.z, params)
    jax.block_until_ready(F)
    mark("residual DONE — probe complete")


if __name__ == "__main__":
    main()
