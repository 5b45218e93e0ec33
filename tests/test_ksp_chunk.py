"""Chunked (host-driven) outer FGMRES — config.ksp_chunk.

The tunneled-TPU transport kills long-running single dispatches (the
ldc3d Re=3000 continuation step died deterministically inside its
one-program linear solve while every shorter step succeeded,
results/logs/ldc3d_p2fb_nref1_re5000.log).  fgmres_stepper splits the
SAME algorithm into chunk-bounded dispatches; these tests pin the
numerics to the monolithic fgmres bit-for-bit-close and gate the
end-to-end almg path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver, config
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.solvers.krylov import fgmres, fgmres_chunked


def _rand_system(n, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 4.0 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


@pytest.mark.parametrize("chunk", [0, 1, 3, 7])
def test_chunked_matches_monolithic(chunk):
    """Same iterates as fgmres for every chunk size — adaptive (0) and
    fixed, including chunks that straddle restart-cycle boundaries
    (restart=5 < iters)."""
    A, b = _rand_system(40)

    def matvec(v):
        return A @ v

    x_ref, info_ref = fgmres(matvec, b, rtol=1e-10, atol=0.0,
                             maxit=60, restart=5)

    def A_of(aux, v):
        return aux @ v

    x_ch, info_ch = fgmres_chunked(
        A_of, lambda aux, v: v, A, b, m=5, maxit=60, rtol=1e-10,
        atol=0.0, chunk=chunk)

    assert int(info_ch["iters"]) == int(info_ref["iters"])
    assert bool(info_ch["converged"])
    np.testing.assert_allclose(np.asarray(x_ch), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-12)


def test_chunked_preconditioned():
    """Right-preconditioned path: aux-threaded Jacobi PC."""
    A, b = _rand_system(30, seed=1)
    dinv = 1.0 / jnp.diag(A)

    x_ref, info_ref = fgmres(lambda v: A @ v, b,
                             pc=lambda v: dinv * v,
                             rtol=1e-11, atol=0.0, maxit=40, restart=8)
    x_ch, info_ch = fgmres_chunked(
        lambda aux, v: aux[0] @ v, lambda aux, v: aux[1] * v,
        (A, dinv), b, m=8, maxit=40, rtol=1e-11, atol=0.0, chunk=2)
    assert int(info_ch["iters"]) == int(info_ref["iters"])
    np.testing.assert_allclose(np.asarray(x_ch), np.asarray(x_ref),
                               rtol=1e-11, atol=1e-11)


def test_chunked_jit_cache_reused():
    """Repeated solves through one jit_cache compile exactly once."""
    A, b = _rand_system(20, seed=2)
    cache = {}
    for shift in (0.0, 0.1):
        fgmres_chunked(lambda aux, v: aux @ v, lambda aux, v: v,
                       A + shift * jnp.eye(20), b, m=6, maxit=30,
                       rtol=1e-9, atol=0.0, chunk=3, jit_cache=cache)
    assert set(cache) == {"stepper"}


def test_almg_chunked_end_to_end():
    """Full Navier-Stokes almg solve with the chunked outer KSP: same
    Krylov/Newton counts as the monolithic path, same solution."""
    problem = TwoDimLidDrivenCavityProblem(4)
    s_mono = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z_mono, i_mono = s_mono.solve(100)

    config.set_ksp_chunk(4)
    try:
        s_ch = ConstantPressureSolver(
            problem, nref=1, k=2, solver_type="almg",
            hierarchy="uniform", gamma=1e4, verbose=False)
        z_ch, i_ch = s_ch.solve(100)
    finally:
        config.set_ksp_chunk(0)

    assert i_ch["converged"]
    assert i_ch["nonlinear_iter"] == i_mono["nonlinear_iter"]
    assert i_ch["linear_iter"] == i_mono["linear_iter"]
    assert float(jnp.max(jnp.abs(z_ch[0] - z_mono[0]))) < 1e-8
