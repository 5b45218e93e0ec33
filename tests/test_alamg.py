"""alamg mode: AL + smoothed-aggregation AMG velocity block — the
reference's hypre/ML baseline (/root/reference/alfi/solver.py:380-384).
The mode must WORK (converge) and must reproduce the papers' contrast:
without the patch smoother + Schoeberl transfer, iteration counts blow
up as gamma grows."""

import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def _make(gamma, solver_type):
    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type=solver_type, hierarchy="uniform", gamma=gamma,
        verbose=False)
    s.advect_val = 1.0
    s.nu_val = s.char_L * s.char_U / 10.0
    return s


def test_alamg_solves_moderate_gamma():
    s = _make(10.0, "alamg")
    _, info = s.solve(10)
    assert info["converged"]
    # sane counts at small gamma where AMG is a fine velocity solver
    assert info["linear_iter"] / max(1, info["nonlinear_iter"]) < 60


def test_alamg_loses_robustness_at_high_gamma():
    """The published contrast: at the AL gamma=1e4 the algebraic
    hierarchy cannot represent the div-free near-null space; one
    Newton-step linear solve needs far more Krylov iterations than the
    patch-smoothed geometric MG."""
    counts = {}
    for st in ("alamg", "almg"):
        s = _make(1e4, st)
        params = s.params()
        F = s.residual_masked(s.z, params)
        tstate = (s._transfer_setup(params)
                  if getattr(s, "_transfer_setup", None) else None)
        _, its = s._linear_step(s.z, F, params, tstate)
        counts[st] = int(its)
    assert counts["alamg"] >= 3 * counts["almg"], counts


def test_alamg_hierarchy_shapes():
    from alfi_tpu.mg.amg import VelocityAMG

    s = _make(10.0, "alamg")
    vamg = s.vamg
    N = s.Z.V.ndof * 2
    assert 0 < vamg.n1 < N // 3  # genuine coarsening
    # prolongator columns reach their aggregates only (bounded support)
    assert vamg.p_idx.shape[0] == N
