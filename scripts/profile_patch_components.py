#!/usr/bin/env python3
"""Component breakdown of the patch apply: gather vs GEMV vs scatter.

roofline_patches.py times the full apply; at round 4 the struct sliced
apply sits at ~2-3% of the HBM bound (1.2-1.5 ms at nref=3 vs 0.04 ms
speed of light) and the question is WHERE the remaining 30x goes.  This
chains each component separately inside one jit (same min-of-reps
protocol as the roofline — the ~26 ms tunnel RPC otherwise dominates):

  full     x -> scatter(solve_t(fac, gather(x)))     the real apply
  gemv     xp -> solve_t(fac, xp)                    patch-minor carried
  gsct     x -> scatter(gather(x))                   slices/tables only

gemv + gsct ~ full localises the cost; a large gap means XLA fuses
across the boundary (then the split numbers are only a bound).  Run
under the same env knobs as production (ALFI_TPU_PATCH_APPLY,
ALFI_TPU_STRUCT_PATCH, ALFI_TPU_MG_STORE).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def measure(nref=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    solver = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(16), nref=nref, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 100.0

    vmg = solver.vmg
    L = vmg.nlevels - 1
    params = solver.params()
    static = getattr(solver, "_almg_static", None)
    _, papply = vmg.patch_solvers[L - 1]

    @jax.jit
    def factor(u, p):
        return vmg.setup(u, p, static=static)["patch_lufacs"][L - 1]

    lufac = factor(solver.z[0], params)
    jax.block_until_ready(lufac)
    ps = vmg.patchsets[L - 1]
    fs = getattr(ps, "_fs", None)
    r = jnp.ones((vmg.levels[L].V.ndof * vmg.d,),
                 dtype=solver.z[0].dtype)

    # rebuild the same gather/scatter closures the solver built, so the
    # components are EXACTLY the production ones
    from alfi_tpu.mg import patches as P
    from alfi_tpu.mg import structured

    gather = scatter = None
    if fs is not None and getattr(fs, "batch_axis", 0) == -1:
        layout = structured.detect(ps)
        if layout is not None:
            # ps is already reordered by build_patch_solver
            gather, scatter = structured.gather_scatter(ps, layout)
        else:
            gather, scatter = P._gather_scatter(ps, transposed=True)

    K = 32

    def timeit(fn, x0):
        @jax.jit
        def run(fac, x):
            return lax.fori_loop(0, K, lambda i, v: fn(fac, v), x)

        jax.block_until_ready(run(lufac, x0))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(lufac, x0))
            best = min(best, time.perf_counter() - t0)
        return best / K

    out = {"nref": nref, "npatches": int(ps.npatches), "m": int(ps.m),
           "backend": jax.default_backend()}
    out["full_ms"] = round(timeit(papply, r) * 1e3, 3)
    if gather is not None:
        xp0 = gather(r)
        out["gemv_ms"] = round(
            timeit(lambda fac, v: fs.solve_t(fac, v), xp0) * 1e3, 3)
        out["gsct_ms"] = round(timeit(
            lambda fac, v: scatter(gather(v), v.dtype), r) * 1e3, 3)
        out["gemv_dtype"] = str(jnp.asarray(
            lufac if not isinstance(lufac, tuple) else lufac[0]).dtype)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys

    measure(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
