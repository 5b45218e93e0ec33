"""Stabilisation tests: SUPG/GLS (Pk-P0) and Burman (SV), mirroring the
reference's usage (/root/reference/alfi/solver.py:202-237; Burman default
for SV production runs, /root/reference/examples/generate_submission:85)."""

import jax.numpy as jnp
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.utils.tree import tnorm


@pytest.mark.parametrize("stab", ["supg", "gls"])
def test_supg_gls_pkp0_converges(stab):
    problem = TwoDimLidDrivenCavityProblem(4)
    s = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
        gamma=1e4, stabilisation_type=stab, verbose=False)
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], (stab, re)
    # stabilised solution stays near the unstabilised one at modest Re
    s0 = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    s0.solve(1)
    z0, _ = s0.solve(100)
    du = float(jnp.max(jnp.abs(z[0] - z0[0])))
    assert du < 0.05


def test_stab_vanishes_for_stokes():
    """advect=0 must kill the stabilisation term exactly."""
    problem = TwoDimLidDrivenCavityProblem(4)
    s = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, stabilisation_type="supg", verbose=False)
    s0 = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z, _ = s.solve(0)
    z0, _ = s0.solve(0)
    assert float(jnp.max(jnp.abs(z[0] - z0[0]))) < 1e-10


def test_burman_sv():
    problem = TwoDimLidDrivenCavityProblem(3)
    s = ScottVogeliusSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="bary",
        patch="macro", gamma=1e4, stabilisation_type="burman",
        verbose=False)
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], re
    # Burman is consistent on the continuous level; the discrete solution
    # should stay divergence-free (the stab term only touches velocity)
    from alfi_tpu.fem.errors import ErrorComputer

    ec = ErrorComputer(s.form)
    assert float(ec.divergence_norm(z[0])) < 1e-7
