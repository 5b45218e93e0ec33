"""Newton's method with the reference's SNES semantics.

Mirrors PETSc ``snes_type newtonls`` with ``snes_linesearch_type basic``
(full step, /root/reference/alfi/solver.py:466-470) and the convergence
tests of SNESConvergedDefault with the tolerance sets of
/root/reference/alfi/solver.py:471-499:

* atol:  ||F|| <= atol
* rtol:  ||F|| <= rtol * ||F0||
* stol:  ||dz|| <= stol * ||z||   (converged_snorm)
* max_it 20, divergence when ||F|| is not finite OR exceeds
  dtol * ||F0|| (SNESConvergedDefault's -snes_divergence_tolerance,
  default 1e4) — without the dtol test a physically unsteady
  continuation step (e.g. the dfg Re=500 endpoint) burns maxit full
  500-iteration Krylov solves on norms marching to overflow.

The loop is a *host* loop (like SNES's own outer loop) driving jitted
residual / linear-solve closures; every per-iteration compute stays on
device.  A fully ``lax.while_loop``-jitted variant for the graft entry is
provided by ``newton_jit``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.tree import taxpy, tnorm, tsub


@dataclass
class NewtonInfo:
    converged: bool = False
    reason: str = ""
    nonlinear_iter: int = 0
    linear_iter: int = 0
    fnorm_history: list = field(default_factory=list)


def newton(residual, linear_solve, z0, *, maxit=20, rtol=1e-9, atol=1e-8,
           stol=1e-6, dtol=1e4, monitor=None):
    """Solve residual(z) = 0.

    residual(z)            -> BC-row-masked residual pytree
    linear_solve(z, F)     -> (dz, linear_iters) solving J(z) dz = -F with
                              dz = 0 on constrained rows
    """
    z = z0
    info = NewtonInfo()
    F = residual(z)
    fnorm = float(tnorm(F))
    fnorm0 = fnorm
    info.fnorm_history.append(fnorm)
    if monitor:
        monitor(0, fnorm)
    if fnorm <= atol:
        info.converged, info.reason = True, "atol"
        return z, info
    for it in range(1, maxit + 1):
        dz, lits = linear_solve(z, F)
        info.linear_iter += int(lits)
        z = taxpy(1.0, dz, z)
        info.nonlinear_iter = it
        F = residual(z)
        fnorm = float(tnorm(F))
        info.fnorm_history.append(fnorm)
        if monitor:
            monitor(it, fnorm)
        if not jnp.isfinite(fnorm):
            info.converged, info.reason = False, "diverged_fnorm_nan"
            return z, info
        if fnorm > dtol * fnorm0:
            info.converged, info.reason = False, "diverged_dtol"
            return z, info
        if fnorm <= atol:
            info.converged, info.reason = True, "atol"
            return z, info
        if fnorm <= rtol * fnorm0:
            info.converged, info.reason = True, "rtol"
            return z, info
        snorm = float(tnorm(dz))
        znorm = float(tnorm(z))
        if snorm <= stol * znorm:
            info.converged, info.reason = True, "stol"
            return z, info
    info.converged, info.reason = False, "max_it"
    return z, info


def newton_jit(residual, linear_solve, z0, *, maxit=20, rtol=1e-9,
               atol=1e-8, stol=1e-6, dtol=1e4):
    """Fully-traced Newton (one XLA program); returns (z, stats array
    [nonlinear_iter, linear_iter, fnorm, converged])."""

    F0 = residual(z0)
    fnorm0 = tnorm(F0)

    def cond(state):
        z, F, fnorm, it, lits, done = state
        return (~done) & (it < maxit)

    def body(state):
        z, F, fnorm, it, lits, done = state
        dz, l = linear_solve(z, F)
        z = taxpy(1.0, dz, z)
        F = residual(z)
        fn = tnorm(F)
        snorm = tnorm(dz)
        znorm = tnorm(z)
        done = (
            (fn <= atol)
            | (fn <= rtol * fnorm0)
            | (snorm <= stol * znorm)
            | ~jnp.isfinite(fn)
            | (fn > dtol * fnorm0)
        )
        return z, F, fn, it + 1, lits + l, done

    init = (z0, F0, fnorm0, jnp.asarray(0), jnp.asarray(0), fnorm0 <= atol)
    z, F, fnorm, nits, lits, done = lax.while_loop(cond, body, init)
    return z, jnp.stack(
        [nits.astype(fnorm.dtype), lits.astype(fnorm.dtype), fnorm,
         done.astype(fnorm.dtype)]
    )
