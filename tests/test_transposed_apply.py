"""Cell-minor (transposed) element-tensor layout for the level matvecs
(ALFI_TPU_LEVEL_APPLY=t): parity with the batch-major einsum path.

The layout exists because XLA tiles the two minor dims of the streamed
(nc, nld, nld) operator to (8, 128) — with nld ~ 12-33 the physical
bytes are several times the logical ones, and the bandwidth-bound
matvec pays for the padding every Krylov iteration (see
solvers/batched_lu.apply_transposed_xla for the rationale).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def _make(transposed, monkeypatch, sv=False):
    if transposed:
        monkeypatch.setenv("ALFI_TPU_LEVEL_APPLY", "t")
    else:
        monkeypatch.delenv("ALFI_TPU_LEVEL_APPLY", raising=False)
    problem = TwoDimLidDrivenCavityProblem(4)
    if sv:
        solver = ScottVogeliusSolver(
            problem, nref=1, k=2, solver_type="almg", hierarchy="bary",
            patch="macro", stabilisation_type="burman",
            stabilisation_weight=5e-3, gamma=1e4, verbose=False)
    else:
        solver = ConstantPressureSolver(
            problem, nref=1, k=2, solver_type="almg",
            hierarchy="uniform", stabilisation_type="supg",
            gamma=1e4, verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 100.0
    return solver


@pytest.mark.parametrize("sv", [False, True])
def test_level_apply_parity(monkeypatch, sv):
    s0 = _make(False, monkeypatch, sv=sv)
    s1 = _make(True, monkeypatch, sv=sv)
    assert s1.vmg.transposed_apply and not s0.vmg.transposed_apply
    params = s0.params()
    static0 = getattr(s0, "_almg_static", None)
    static1 = getattr(s1, "_almg_static", None)
    st0 = s0.vmg.setup(s0.z[0], params, static=static0,
                       p_fine=s0.z[1])
    st1 = s1.vmg.setup(s1.z[0], params, static=static1,
                       p_fine=s1.z[1])
    rng = np.random.default_rng(0)
    for l in range(s0.vmg.nlevels):
        lev = s0.vmg.levels[l]
        v = jnp.asarray(rng.normal(size=(lev.V.ndof, s0.vmg.d)))
        f0 = (st0["ftensors"][l] if s0.vmg.stab_facet is not None
              else None)
        f1 = (st1["ftensors"][l] if s1.vmg.stab_facet is not None
              else None)
        y0 = np.asarray(s0.vmg.level_apply(l, st0["tensors"][l], v,
                                           ftensors=f0))
        y1 = np.asarray(s1.vmg.level_apply(l, st1["tensors"][l], v,
                                           ftensors=f1))
        rel = np.abs(y1 - y0).max() / max(np.abs(y0).max(), 1e-30)
        assert rel < 1e-12, (l, rel)


def test_full_solve_parity(monkeypatch):
    s0 = _make(False, monkeypatch)
    z0, i0 = s0.solve(100)
    s1 = _make(True, monkeypatch)
    z1, i1 = s1.solve(100)
    assert i0["converged"] and i1["converged"]
    assert i1["linear_iter"] == i0["linear_iter"]
    assert float(jnp.max(jnp.abs(z1[0] - z0[0]))) < 1e-6
