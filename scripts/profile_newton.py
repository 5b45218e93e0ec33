"""Attribute the per-Newton-step wall-clock of the bench config.

bench.py measures ~24.7 s for 7 Newton steps (22 Krylov iters) while an
FMG cycle chains at ~112 ms — so ~2.5 s of the 24.7 are cycle time and
the rest is *something else inside the jitted linear step* (vmg.setup's
per-step refactorisations, the outer FGMRES glue, the Schur wrapper) or
the Python-side Newton loop.  This script times each piece on-device:

  residual_ms        one masked residual evaluation
  transfer_setup_ms  Schoeberl transfer state (per params change)
  setup_ms           vmg.setup: level tensors + patch factors + coarse LU
  solveA_ms          one velocity-block solve (the Schur PC core)
  lin_ms             the full jitted linear step (setup + outer FGMRES)
  newton_step_ms     one full solver Newton step via solver internals

Every piece is timed executed (post-compile), best of reps.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def best_exec(fn, *args, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main(nref=2):
    import jax
    import jax.numpy as jnp

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    solver = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(16), nref=nref, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 100.0
    params = solver.params()
    vmg = solver.vmg
    static = solver._almg_static
    out = {"nref": nref, "ndof": int(solver.Z.dim)}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    t, F = best_exec(solver._residual_jit, solver.z, params)
    emit("residual_ms", round(t * 1e3, 2))

    t, tstate = best_exec(solver._transfer_setup, params)
    emit("transfer_setup_ms", round(t * 1e3, 2))

    setup_jit = jax.jit(
        lambda z, p, ts, st: vmg.setup(z[0], p, schoeberl_state=ts,
                                       static=st, p_fine=z[1]))
    t, state = best_exec(setup_jit, solver.z, params, tstate, static)
    emit("setup_ms", round(t * 1e3, 2))

    # state contains closures (coarse solve) -> rebuild inside jit for
    # the solve_A timing
    @jax.jit
    def solveA(z, p, ts, st, r):
        stt = vmg.setup(z[0], p, schoeberl_state=ts, static=st,
                        p_fine=z[1])
        return vmg.make_solve_A(stt)(r)

    L = vmg.nlevels - 1
    r0 = jnp.ones((vmg.levels[L].V.ndof, vmg.d), dtype=jnp.float64)
    t_sA, _ = best_exec(solveA, solver.z, params, tstate, static, r0)
    emit("setup_plus_solveA_ms", round(t_sA * 1e3, 2))

    t, (dz, iters) = best_exec(
        lambda z, F_, p, ts: solver._linear_step(z, F_, p, ts),
        solver.z, F, params, tstate)
    emit("lin_ms", round(t * 1e3, 2))
    emit("lin_iters", int(iters))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
