"""Adjoint solver (reference setup_adjoint, alfi/solver.py:520-535):
F_z(z)^T z_adj = -dJ/dz at the converged state, homogenised BCs."""

import jax
import jax.numpy as jnp
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.solvers.linear import make_jacobian_matvec
from alfi_tpu.utils.tree import tnorm


def kinetic_energy(z):
    u, p = z
    return 0.5 * jnp.sum(u * u)


def _solve_with(solver_type):
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type=solver_type, hierarchy="uniform", verbose=False)
    s.solve(1)
    s.solve(10)
    s.setup_adjoint(kinetic_energy)
    z_adj, info = s.solve_adjoint()
    return s, z_adj, info


def test_adjoint_residual_lu():
    s, z_adj, _ = _solve_with("lu")
    # the adjoint equation: J^T z_adj + dJ/dz = 0 (BC rows excluded)
    params = s.params()
    fwd = make_jacobian_matvec(s.form.residual, s.bcset, s.z, params)
    (JTlam,) = jax.linear_transpose(fwd, z_adj)(z_adj)
    rhs = s.bcset.zero(jax.grad(kinetic_energy)(s.z))
    r = jax.tree.map(lambda a, b: a + b, s.bcset.zero(JTlam), rhs)
    if s.nsp:
        u, p = r
        r = (u, p - jnp.mean(p))
    assert float(tnorm(r)) < 1e-6 * max(1.0, float(tnorm(rhs)))


def test_adjoint_almg_matches_lu():
    s1, adj_lu, _ = _solve_with("lu")
    s2, adj_mg, info = _solve_with("almg")
    u1, p1 = adj_lu
    u2, p2 = adj_mg
    assert float(jnp.max(jnp.abs(u1 - u2))) < 1e-5 * (
        1.0 + float(jnp.max(jnp.abs(u1))))
    # pressure gauge differs (lu pins, almg mean-normalises): compare
    # mean-removed
    p1 = p1 - jnp.mean(p1)
    p2 = p2 - jnp.mean(p2)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-5 * (
        1.0 + float(jnp.max(jnp.abs(p1))))
    assert info["linear_iter"] < 100
