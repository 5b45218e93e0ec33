"""Telescoped host sparse coarse solve (solvers/host_coarse.py) — the
SuperLU_dist analogue that removes the dense-coarse memory cap
(/root/reference/alfi/solver.py:354-377)."""

import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def _solve(monkeypatch, cap):
    monkeypatch.setenv("ALFI_TPU_DENSE_COARSE_MAX", str(cap))
    solver = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False)
    _, info = solver.solve(100)
    return solver, info


def test_host_sparse_coarse_matches_dense(monkeypatch):
    s_host, i_host = _solve(monkeypatch, cap=10)   # force host path
    assert s_host.vmg._host_coarse is not None
    s_ref, i_ref = _solve(monkeypatch, cap=10 ** 9)  # dense path
    assert s_ref.vmg._host_coarse is None
    assert i_host["converged"] and i_ref["converged"]
    # both coarse solves are exact f64 -> identical iteration counts
    assert i_host["linear_iter"] == i_ref["linear_iter"]
    assert i_host["nonlinear_iter"] == i_ref["nonlinear_iter"]
    du = np.linalg.norm(np.asarray(s_host.z[0] - s_ref.z[0]))
    assert du / np.linalg.norm(np.asarray(s_ref.z[0])) < 1e-9


def test_host_factor_cache_reused(monkeypatch):
    """The splu factor is keyed by the device-computed fingerprint and
    reused across the many coarse solves of one Newton step."""
    s, _ = _solve(monkeypatch, cap=10)
    hc = s.vmg._host_coarse
    key, fac = hc._cache
    assert fac is not None
    s.solve(100)  # converged state: re-solve reuses/refreshes the slot
    assert hc._cache[1] is not None
