"""Micro-profile of the patch-smoother hot path on the live backend:
element tensors, patch-matrix assembly, factorisation (per strategy),
and batched solves — the data behind the mixed-precision design choice
(docs/DESIGN.md precision strategy)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:10.1f} ms")
    return out


def main(baseN=16, nref=2):
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(baseN), nref=nref, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    print("backend", jax.default_backend(), "ndof", s.Z.dim)
    s.advect_val, s.nu_val = 1.0, s.char_L * s.char_U / 100.0
    params = s.params()
    vmg = s.vmg
    L = vmg.nlevels - 1
    lev = vmg.levels[L]
    from alfi_tpu.mg.patches import (
        assemble_patch_matrices,
        build_patch_solver,
        star_patches,
    )

    ps = star_patches(lev.V, np.asarray(lev.mask_flat))
    print("fine level: npatches", ps.npatches, "m", ps.m,
          "ncells", lev.V.mesh.num_cells)

    tensors = timeit("element tensors",
                     jax.jit(lambda p: lev.form.velocity_element_tensors(
                         p, s.z[0])), params)
    Ap = timeit("patch-matrix assembly",
                jax.jit(lambda t: assemble_patch_matrices(ps, t)), tensors)

    from alfi_tpu.solvers.batched_lu import (
        _CustomF64Factorization,
        _QRFactorization,
        _ScipyFactorization,
    )

    strategies = [("qr-f64", _QRFactorization()),
                  ("lu-f32", _ScipyFactorization(jnp.float32)),
                  ("custom-lu-f64", _CustomF64Factorization())]
    r = jnp.ones((ps.nflat,), dtype=Ap.dtype)
    for nm, fs in strategies:
        try:
            fac = timeit(f"factor[{nm}]", jax.jit(fs.factor), Ap)
            gather_r = jnp.where(jnp.asarray(ps.active),
                                 jnp.ones((ps.npatches, ps.m), Ap.dtype),
                                 0.0)
            timeit(f"solve[{nm}]", jax.jit(fs.solve), fac, gather_r)
        except Exception as e:  # noqa: BLE001
            print(f"{nm}: FAILED {type(e).__name__}: {e}")

    # full smoother apply (gather+solve+scatter) with default strategy
    factor, papply = build_patch_solver(ps)
    fac = jax.jit(factor)(tensors)
    timeit("smoother apply (default)", jax.jit(papply), fac, r)

    # coarse dense factor
    from alfi_tpu.solvers.linear import assemble_dense_from_tensors

    lev0 = vmg.levels[0]
    t0j = jax.jit(lambda p: lev0.form.velocity_element_tensors(
        p, vmg.injects[0].apply(vmg.injects[1].apply(s.z[0]))))(params)
    A0 = jax.jit(lambda t: assemble_dense_from_tensors(
        lev0.form, t, lev0.mask_u))(t0j)
    print("coarse dense N", A0.shape)
    from alfi_tpu.solvers.batched_lu import get_factorization

    fs = get_factorization()
    timeit("coarse factor (default)", jax.jit(fs.factor), A0)

    # schoeberl transfer setup
    if vmg.schoeberl is not None:
        timeit("schoeberl setup (all levels)",
               jax.jit(vmg.transfer_setup), params, n=3)


if __name__ == "__main__":
    main()
