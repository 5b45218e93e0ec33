"""gamma-robustness component test (SURVEY.md §4 item 3): the velocity
multigrid with patch smoother + Schoeberl transfer must have iteration
counts FLAT in gamma; jacobi (or no transfer) blows up.  This is the
isolation study of /root/reference/examples/graddiv/graddiv.py."""

import pytest

from alfi_tpu.graddiv import GradDivSolver

GAMMAS = [0.0, 1.0, 1e2, 1e4, 1e6]


def sweep(**kw):
    s = GradDivSolver(baseN=4, nref=2, k=2, **kw)
    out = {}
    for g in GAMMAS:
        _, its, conv = s.solve(g)
        out[g] = its if conv else 999
    return out


def test_patch_with_transfer_is_gamma_robust():
    its = sweep(discretisation="pkp0", smoother="patch", transfer=True)
    assert max(its.values()) <= 25, its
    # flat: large-gamma cost within 3x of gamma=0
    assert its[1e6] <= 3 * max(1, its[0.0]) + 8, its


def test_jacobi_blows_up_in_gamma():
    its = sweep(discretisation="pkp0", smoother="jacobi", transfer=True)
    robust = sweep(discretisation="pkp0", smoother="patch", transfer=True)
    assert its[1e4] > 3 * robust[1e4], (its, robust)


def test_transfer_matters_at_high_gamma():
    with_t = sweep(discretisation="pkp0", smoother="patch", transfer=True)
    without = sweep(discretisation="pkp0", smoother="patch", transfer=False)
    assert with_t[1e6] < without[1e6], (with_t, without)


def test_sv_bary_macro_gamma_robust():
    s = GradDivSolver(baseN=3, nref=2, k=2, discretisation="sv",
                      hierarchy="bary", patch="macro", smoother="patch",
                      transfer=True)
    its = {}
    for g in GAMMAS:
        _, n, conv = s.solve(g)
        its[g] = n if conv else 999
    assert max(its.values()) <= 30, its


def test_amg_baseline_blows_up_in_gamma():
    """The reference's algebraic baseline (graddiv.py smoother "amg" ->
    hypre boomeramg): smoothed-aggregation AMG cannot see the
    divergence-free near-null space, so iterations must blow up with
    gamma while patch+transfer stays flat — the papers' contrast."""
    its = sweep(discretisation="pkp0", smoother="amg", transfer=False)
    robust = sweep(discretisation="pkp0", smoother="patch",
                   transfer=True)
    assert its[0.0] < 999, its          # gamma=0: plain AMG converges
    assert its[1e4] > 3 * robust[1e4], (its, robust)
