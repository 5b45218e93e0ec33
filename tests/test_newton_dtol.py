"""SNES divergence tolerance (-snes_divergence_tolerance, default 1e4).

Without the dtol test a physically unsteady continuation step (the dfg
Re=500 endpoint marched its residual from 4e-5 to 1e+37 across 18 full
500-iteration Krylov solves, results/logs/dfg_pkp0_nref1_re500.log)
burns maxit hopeless linear solves before reporting divergence."""

import jax.numpy as jnp

from alfi_tpu.solvers.newton import newton


def _diverging_system():
    """A 'solver' whose steps multiply the residual 100x per iteration
    (the shape of the dfg log: 4e-5 -> 1e+37 over 18 steps)."""

    def residual(z):
        return z

    def linear_solve(z, F):
        return 99.0 * z, jnp.asarray(1)

    return residual, linear_solve


def test_newton_dtol_aborts_early():
    residual, linear_solve = _diverging_system()
    z, info = newton(residual, linear_solve, jnp.asarray(1.0),
                     maxit=20, dtol=1e4)
    assert not info.converged
    assert info.reason == "diverged_dtol"
    # ||F|| = 100^k: crosses 1e4*||F0|| at k=3
    assert info.nonlinear_iter <= 3


def test_newton_dtol_off_reaches_maxit():
    residual, linear_solve = _diverging_system()
    z, info = newton(residual, linear_solve, jnp.asarray(1.0),
                     maxit=12, dtol=jnp.inf)
    assert not info.converged
    assert info.reason == "max_it"
    assert info.nonlinear_iter == 12
