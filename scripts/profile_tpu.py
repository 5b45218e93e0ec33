"""Phase-level TPU profiling of the almg solve: where do the seconds go?

Times (after a compile warmup) the jitted pieces separately:
  residual        — assembled residual
  mg-setup        — per-Newton-step state (tensors, patch factorisations,
                    coarse factorisation, schoeberl setup)
  mg-cycle        — one FMG application
  linear-step     — the full FGMRES Newton step
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:14s} {dt*1e3:10.1f} ms")
    return out


def main(baseN=16, nref=2):
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(baseN), nref=nref, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    print("backend", jax.default_backend(), "ndof", s.Z.dim)
    s.advect_val, s.nu_val = 1.0, s.char_L * s.char_U / 100.0
    params = s.params()
    z = s.z
    vmg = s.vmg

    timeit("residual", jax.jit(s.residual_masked), z, params)

    def setup_cycles(n):
        def fn(u, p, r):
            st = vmg.setup(u, p)
            x = r
            for _ in range(n):
                x = vmg.fmg(st, x)
            return x

        return jax.jit(fn)

    timeit("setup+1cycle", setup_cycles(1), z[0], params, z[0])
    timeit("setup+2cycle", setup_cycles(2), z[0], params, z[0])

    F = s._residual_jit(z, params)
    tstate = s._transfer_setup(params)
    timeit("linear-step", s._linear_step, z, F, params, tstate)


if __name__ == "__main__":
    main()
