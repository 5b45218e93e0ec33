"""The gamma=0 'simple' baseline (reference solver.py:423-445): must
converge but with Re-GROWING iteration counts — the contrast that
motivates the AL solvers."""

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def test_simple_mode_converges_but_degrades():
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="simple", hierarchy="uniform", verbose=False)
    assert s.gamma == 0.0
    kpn = {}
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], re
        kpn[re] = info["linear_iter"] / max(1, info["nonlinear_iter"])
    almg = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    almg.solve(1)
    _, info = almg.solve(100)
    kpn_almg = info["linear_iter"] / max(1, info["nonlinear_iter"])
    # the AL solver beats the baseline at Re=100
    assert kpn_almg < kpn[100], (kpn, kpn_almg)


def test_lsc_mode_converges_but_degrades():
    """The LSC competitor (reference solver.py:447-460): gamma=0,
    Least-Squares-Commutator Schur approximation.  Converges, but with
    far more Krylov iterations than almg — the papers' core contrast."""
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="lsc", hierarchy="uniform", verbose=False)
    assert s.gamma == 0.0
    kpn = {}
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], re
        kpn[re] = info["linear_iter"] / max(1, info["nonlinear_iter"])
    almg = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    almg.solve(1)
    _, info = almg.solve(100)
    kpn_almg = info["linear_iter"] / max(1, info["nonlinear_iter"])
    assert kpn_almg < kpn[100], (kpn, kpn_almg)
