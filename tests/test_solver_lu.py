"""End-to-end tests of the minimum slice (SURVEY.md §7 stage 3):
ldc2d, [P2]^2-P0, lu / allu modes, Reynolds continuation.

The reference has no test suite; these encode its runtime self-checks
(gamma-free residual equality, /root/reference/alfi/solver.py:282-291)
and basic cavity physics as assertions."""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.utils.tree import tnorm


@pytest.fixture(scope="module")
def lu_solver():
    problem = TwoDimLidDrivenCavityProblem(4)
    return ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, verbose=False)


def test_stokes_lu(lu_solver):
    s = lu_solver
    z, info = s.solve(0)
    assert info["converged"]
    u, p = z
    # residual small at the solution (with the real BCs)
    F = s.residual_masked(z, s.params())
    assert float(tnorm(F)) < 1e-6
    # lid drives positive x-velocity near the top, interior flow nonzero
    assert float(jnp.max(jnp.abs(u))) > 0.1
    # gamma-free residual also small: solution is (nearly) divergence free
    params0 = dict(s.params())
    params0["gamma"] = jnp.zeros(())
    F0 = s.residual_masked(z, params0)
    assert float(tnorm(F0)) < 1e-6
    # Pk-P0 controls only the CELL-AVERAGED divergence: (div u, q) = 0 for
    # all q in P0 (pointwise div only converges with h)
    assert float(jnp.linalg.norm(s.form.apply_divergence(u))) < 1e-8


def test_navier_stokes_continuation_lu(lu_solver):
    s = lu_solver
    for re in [1, 10, 100]:
        z, info = s.solve(re)
        assert info["converged"], f"Re={re} diverged"
        assert info["nonlinear_iter"] <= 6
    u, p = z
    assert float(jnp.linalg.norm(s.form.apply_divergence(u))) < 1e-8
    # pressure pinned (lu mode pins dof 0 when there is a nullspace)
    assert abs(float(p[0])) < 1e-12


def test_allu_fieldsplit_matches_lu():
    """The Schur-fieldsplit FGMRES solve must reproduce the direct solve."""
    problem = TwoDimLidDrivenCavityProblem(4)
    s_lu = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    s_fs = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z1, info1 = s_lu.solve(10)
    z2, info2 = s_fs.solve(10)
    assert info2["converged"]
    # same velocity field (pressure differs by the nullspace treatment
    # until mean-correction, which both apply)
    du = float(jnp.max(jnp.abs(z1[0] - z2[0])))
    assert du < 1e-6
    dp = float(jnp.max(jnp.abs((z1[1] - jnp.mean(z1[1]))
                               - (z2[1] - jnp.mean(z2[1])))))
    assert dp < 1e-4


def test_al_schur_iterations_flat_in_gamma():
    """The whole point of the AL approach: with the exact velocity-block
    inverse, outer FGMRES iterations DROP as gamma grows (the mass-matrix
    Schur approximation becomes exact, arXiv:1810.03315)."""
    problem = TwoDimLidDrivenCavityProblem(4)
    iters = {}
    for gamma in [1.0, 1e2, 1e4]:
        s = ConstantPressureSolver(
            problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
            gamma=gamma, verbose=False)
        z, info = s.solve(0)
        assert info["converged"]
        iters[gamma] = info["linear_iter"]
    assert iters[1e4] <= iters[1e2] <= iters[1.0]
    assert iters[1e4] <= 4
