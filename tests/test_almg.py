"""End-to-end tests of the full AL-multigrid solver mode (the reference's
headline configuration, /root/reference/alfi/solver.py:353-379):
Newton-FGMRES + Schur fieldsplit + patch-smoothed FMG velocity solve with
Schoeberl prolongation."""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


@pytest.fixture(scope="module")
def almg_solver():
    problem = TwoDimLidDrivenCavityProblem(4)
    return ConstantPressureSolver(
        problem, nref=2, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)


def test_almg_stokes(almg_solver):
    s = almg_solver
    z, info = s.solve(0)
    assert info["converged"]
    u, p = z
    assert float(jnp.linalg.norm(s.form.apply_divergence(u))) < 1e-7
    assert info["linear_iter"] <= 10


def test_almg_continuation_robust(almg_solver):
    """Krylov-per-Newton must stay low and flat along the Re sweep."""
    s = almg_solver
    kpn = {}
    for re in [10, 100, 200]:
        z, info = s.solve(re)
        assert info["converged"], f"Re={re} diverged"
        kpn[re] = info["linear_iter"] / max(1, info["nonlinear_iter"])
    assert max(kpn.values()) <= 15, kpn


def test_almg_matches_lu():
    problem = TwoDimLidDrivenCavityProblem(4)
    s_mg = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)
    s_lu = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z1, i1 = s_mg.solve(10)
    z2, i2 = s_lu.solve(10)
    assert i1["converged"] and i2["converged"]
    assert float(jnp.max(jnp.abs(z1[0] - z2[0]))) < 1e-6


def test_almg_multiplicative_sweep():
    """Ordered multiplicative patch composition (colored sub-sweeps) must
    converge at least as fast as additive."""
    problem = TwoDimLidDrivenCavityProblem(4)
    s = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, patch_composition="multiplicative", verbose=False)
    z, info = s.solve(100)
    assert info["converged"]
    assert info["linear_iter"] / max(1, info["nonlinear_iter"]) <= 10


def test_almg_sv_bary_macro():
    """Scott-Vogelius + bary hierarchy + macrostar patches (the second
    flagship configuration)."""
    problem = TwoDimLidDrivenCavityProblem(3)
    s = ScottVogeliusSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="bary",
        patch="macro", gamma=1e4, verbose=False)
    z, info = s.solve(10)
    assert info["converged"]
    from alfi_tpu.fem.errors import ErrorComputer

    ec = ErrorComputer(s.form)
    assert float(ec.divergence_norm(z[0])) < 1e-8


@pytest.mark.slow
def test_supg_high_re_krylov_flatness():
    """The headline capability (reference examples/iters.py): with the
    stabilised Jacobian in the MG/patch operators, Krylov-per-Newton
    stays nearly flat in Re.  Without those terms this config measured
    kpn 10 -> 56 over Re 100 -> 1500 (results/iters_*_BEFORE_stab_pc)."""
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(8), nref=1, k=2,
        solver_type="almg", hierarchy="uniform",
        stabilisation_type="supg", restriction=True, verbose=False)
    kpn = {}
    for re in [1, 10, 100, 300, 500, 1000]:
        _, info = s.solve(re)
        assert info["converged"], re
        kpn[re] = info["linear_iter"] / max(1, info["nonlinear_iter"])
    assert kpn[1000] <= 15.0, kpn


@pytest.mark.slow
def test_sv_burman_high_re_krylov_flatness():
    """SV analogue of the gate above (reference Makefile target
    iters2dsv): Scott-Vogelius k=2 on bary with macrostar patches and
    Burman stabilisation riding the MG/patch operators.  The measured
    headline table (results/README.md) has kpn 6.67 at Re=1000 at
    baseN=10; before the Burman facet coupling entered the
    preconditioner this protocol was at kpn 20.7 by Re=900 and climbing
    (results/logs/sv_validate_re1000.log)."""
    s = ScottVogeliusSolver(
        TwoDimLidDrivenCavityProblem(6), nref=1, k=2,
        solver_type="almg", hierarchy="bary", patch="macro",
        stabilisation_type="burman", stabilisation_weight=5e-3,
        restriction=True, gamma=1e4, verbose=False)
    kpn = {}
    for re in [1, 10, 100, 300, 500, 1000]:
        _, info = s.solve(re)
        assert info["converged"], re
        kpn[re] = info["linear_iter"] / max(1, info["nonlinear_iter"])
    assert kpn[1000] <= 15.0, kpn
