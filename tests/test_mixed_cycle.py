"""Gamma-split mixed-precision MG cycle (config.mg_dtype = f32).

The f32 cycle is only legitimate if it preserves the AL term's
cancellation: an all-f32 contraction of nu K + gamma G rounds the
gamma part at gamma*eps32 absolute, which buries the viscous signal on
near-divergence-free fields (round-2's measured blow-up at Re>=100).
The gamma-split dict form of level_apply streams M in f32 but
accumulates the grad-div dot in f64.  Gates:

 * operator equivalence: the dict apply matches the f64 summed-tensor
   apply to f32 relative accuracy;
 * cancellation: on a discretely divergence-free field the gamma-split
   f32 apply reproduces the f64 gamma-term (~0) far below the
   gamma*eps32 noise floor of the all-f32 summed apply;
 * iteration parity: a continuation sweep to Re=1000 with the f32
   cycle matches the f64 cycle's Krylov counts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.config import real_dtype, set_mg_dtype
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


@pytest.fixture
def f32_cycle():
    set_mg_dtype(jnp.float32)
    yield
    set_mg_dtype(real_dtype)


def _solver(**kw):
    return ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(8), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False, **kw)


def _setup_state(s):
    params = s.params()
    tstate = s._transfer_setup(params)
    return s.vmg.setup(s.z[0], params, schoeberl_state=tstate,
                       static=s._almg_static), params


def test_gamma_split_apply_matches_f64(f32_cycle):
    s = _solver()
    s.advect_val = 1.0
    s.nu_val = s.char_L * s.char_U / 100.0
    state, params = _setup_state(s)
    vmg = s.vmg
    L = vmg.nlevels - 1
    tens = state["tensors"][L]
    assert isinstance(tens, dict), "f32 cycle must store gamma-split"
    assert tens["M"].dtype == jnp.float32

    # f64 reference operator rebuilt from the same parts
    lev = vmg.levels[L]
    K_el, G_el = lev.form._static_velocity_tensors()
    N_el = lev.form.advection_element_tensors(s.z[0])
    T64 = (params["nu"] * K_el + params["advect"] * N_el
           + params["gamma"] * G_el)

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((lev.V.ndof, vmg.d)))
    y64 = vmg.level_apply(L, T64, v)
    y32 = vmg.level_apply(L, tens, v.astype(jnp.float32))
    rel = float(jnp.linalg.norm(y32.astype(jnp.float64) - y64)
                / jnp.linalg.norm(y64))
    assert rel < 1e-5


def test_gamma_split_preserves_cancellation(f32_cycle):
    """On a discretely div-free field the gamma term must vanish in the
    f32 apply too — the whole point of the split."""
    s = _solver()
    state, params = _setup_state(s)
    vmg = s.vmg
    L = vmg.nlevels - 1
    lev = vmg.levels[L]
    tens = state["tensors"][L]
    B = np.asarray(lev.form.graddiv_factors())[:, :, 0]  # (nc, nld)
    rows = np.asarray(lev.rows)

    # exact projection to discrete div-freeness WITHIN the free dofs:
    # v -= C^T (C C^T)^+ C v with C the per-cell constraint matrix
    # restricted to unconstrained columns (projecting before masking
    # would let the mask reintroduce cell divergences at the boundary,
    # whose genuine gamma-terms then dominate the reference norm)
    rng = np.random.default_rng(5)
    nflat = lev.V.ndof * vmg.d
    nc = B.shape[0]
    mflat = np.asarray(lev.mask_u).reshape(-1)
    C = np.zeros((nc, nflat))
    np.add.at(C, (np.repeat(np.arange(nc), rows.shape[1]),
                  rows.ravel()), B.ravel())
    C = C * mflat[None, :]
    vf = rng.standard_normal(nflat) * mflat
    lam = np.linalg.lstsq(C @ C.T, C @ vf, rcond=None)[0]
    vf = vf - C.T @ lam
    d = (B * vf[rows]).sum(axis=1)
    assert np.max(np.abs(d)) < 1e-8 * np.linalg.norm(vf)

    # the f32 CYCLE vector is the ground-truth input (exactly
    # representable in f64); truth = f64 apply of that vector.  Casting
    # an f64-div-free field and comparing against its f64 image would
    # instead measure the cast's eps32 divergence — a property of the
    # test vector, not of the apply.
    v32 = jnp.asarray(vf.reshape(lev.V.ndof, vmg.d)).astype(jnp.float32)
    v64 = v32.astype(jnp.float64)

    K_el, G_el = lev.form._static_velocity_tensors()
    T64 = params["nu"] * K_el + params["gamma"] * G_el
    y64 = vmg.level_apply(L, T64, v64)

    y32 = vmg.level_apply(L, tens, v32)
    # all-f32 SUMMED tensor control: the broken formulation
    ysum32 = vmg.level_apply(L, T64.astype(jnp.float32), v32)

    ref = jnp.linalg.norm(y64)
    err_split = float(jnp.linalg.norm(y32.astype(jnp.float64) - y64)
                      / ref)
    err_sum = float(jnp.linalg.norm(ysum32.astype(jnp.float64) - y64)
                    / ref)
    # the split apply's error is a consistent eps32 perturbation of the
    # M-part; the summed contraction's gamma*eps32 rounding is ~100x it
    assert err_split < 3e-6
    assert err_sum > 30 * err_split


def test_gamma_split_with_jacobi_smoother(f32_cycle):
    """The gamma-split stream is smoother-independent: a jacobi-
    smoothed f32 cycle must store dicts too (an all-f32 cast of
    nu K + gamma G is the documented gamma*eps32 blow-up)."""
    from alfi_tpu.graddiv import GradDivSolver

    gd = GradDivSolver(dim=2, baseN=4, nref=1, k=2, smoother="jacobi",
                       hierarchy="uniform")
    params = {"nu": jnp.asarray(1.0, dtype=real_dtype),
              "gamma": jnp.asarray(1e4, dtype=real_dtype),
              "advect": jnp.asarray(0.0, dtype=real_dtype)}
    zero_u = jnp.zeros((gd.form.V.ndof, gd.d), dtype=real_dtype)
    state = gd.vmg.setup(zero_u, params)
    L = gd.vmg.nlevels - 1
    tens = state["tensors"][L]
    assert isinstance(tens, dict), \
        "jacobi f32 cycle must store gamma-split dicts"
    assert tens["M"].dtype == jnp.float32
    # and the diagonals were still assembled from the f64 sum
    assert state["patch_lufacs"][L - 1].ndim == 1


def test_gamma_split_transposed_apply(f32_cycle, monkeypatch):
    """ALFI_TPU_LEVEL_APPLY=t + mg_dtype=f32: the dict parts are stored
    cell-minor and the transposed dict branch of level_apply matches
    the batch-major one exactly in structure / to f32 accuracy."""
    monkeypatch.setenv("ALFI_TPU_LEVEL_APPLY", "t")
    st = _solver()
    state_t, params = _setup_state(st)
    vmg = st.vmg
    L = vmg.nlevels - 1
    lev = vmg.levels[L]
    tens = state_t["tensors"][L]
    assert isinstance(tens, dict)
    nld = lev.rows.shape[1]
    assert tens["M"].shape[-1] != nld, "dict M must be cell-minor"

    K_el, G_el = lev.form._static_velocity_tensors()
    T64 = params["nu"] * K_el + params["gamma"] * G_el
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((lev.V.ndof, vmg.d)))
    y64 = vmg.level_apply(L, T64, v)
    y32 = vmg.level_apply(L, tens, v.astype(jnp.float32))
    rel = float(jnp.linalg.norm(y32.astype(jnp.float64) - y64)
                / jnp.linalg.norm(y64))
    assert rel < 1e-5


@pytest.mark.slow
def test_f32_cycle_iteration_parity():
    res = [1, 10, 100, 1000]

    def sweep():
        s = _solver(stabilisation_type="supg")
        counts = []
        for re in res:
            _, info = s.solve(re)
            assert info["converged"]
            counts.append(info["linear_iter"])
        return counts

    c64 = sweep()
    set_mg_dtype(jnp.float32)
    try:
        c32 = sweep()
    finally:
        set_mg_dtype(real_dtype)
    # measured (CPU, this config): f64 [8,7,18,49] vs f32 [8,7,19,53]
    # — the ~8% tail is the f32 smoother ARITHMETIC (keeping
    # schoeberl/patch_lufacs state in f64 does not close it), the
    # price of a ~3.5x cheaper cycle.  Gate: within 10% + 1 iteration,
    # and NO blow-up (round 2's all-f32 cycle diverged here).
    c32, c64 = np.array(c32), np.array(c64)
    assert np.all(c32 <= 1.10 * c64 + 1), (c64.tolist(), c32.tolist())


def test_store_f32_iteration_parity():
    """store-f32 / compute-f64 (config.mg_store): the operator stream
    is a consistent relative-eps32 perturbation, so Krylov counts must
    match the f64 control EXACTLY (measured at Re=700 nref=2: 15 == 15,
    scripts/diag_f32_tail.py) — unlike the f32-COMPUTE cycle above
    whose tail drifts (31 vs 15 at Re=700)."""
    from alfi_tpu.config import set_mg_store

    res = [1, 10, 100, 1000]

    def sweep():
        s = _solver(stabilisation_type="supg")
        counts = []
        for re in res:
            _, info = s.solve(re)
            assert info["converged"]
            counts.append(info["linear_iter"])
        return counts

    c64 = sweep()
    set_mg_store(jnp.float32)
    try:
        cs = sweep()
    finally:
        set_mg_store(real_dtype)
    cs, c64 = np.array(cs), np.array(c64)
    assert np.all(cs <= c64 + 1), (c64.tolist(), cs.tolist())


def test_smooth_f32_iteration_parity():
    """Defect-correction mixed precision (config.mg_smooth_dtype,
    VERDICT r4 item 2): residuals/corrections stay f64, only the inner
    fixed-iteration smoother Krylov runs f32.  The f32 rounding of the
    smoothed correction is RELATIVE to the defect, so — unlike the
    all-f32 cycle above whose counts drift ~8-100% — the Krylov counts
    must stay within noise of the f64 control."""
    from alfi_tpu.config import set_mg_smooth_dtype

    res = [1, 10, 100, 1000]

    def sweep():
        s = _solver(stabilisation_type="supg")
        counts = []
        for re in res:
            _, info = s.solve(re)
            assert info["converged"]
            counts.append(info["linear_iter"])
        return counts

    c64 = sweep()
    set_mg_smooth_dtype(jnp.float32)
    try:
        cm = sweep()
    finally:
        set_mg_smooth_dtype(real_dtype)
    cm, c64 = np.array(cm), np.array(c64)
    assert np.all(cm <= c64 + 1), (c64.tolist(), cm.tolist())


def test_smooth_f32_state_dtypes():
    """Only the smoother's private state narrows: patch factors mdt,
    residual chain / transfers / coarse stay f64."""
    from alfi_tpu.config import set_mg_smooth_dtype

    set_mg_smooth_dtype(jnp.float32)
    try:
        s = _solver(stabilisation_type="supg")
        s.solve(1)
        state, params = _setup_state(s)
    finally:
        set_mg_smooth_dtype(real_dtype)
    import jax

    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state["patch_lufacs"][-1])
        if jnp.issubdtype(leaf.dtype, jnp.floating))
    # coarse factor keeps its own (f64-bearing) precision mix
    assert any(
        leaf.dtype == jnp.float64
        for leaf in jax.tree.leaves(state["coarse_fac"])
        if jnp.issubdtype(leaf.dtype, jnp.floating))


def test_store_f32_state_dtypes():
    """Only the level-operator stream narrows: tensors/ftensors f32,
    vectors and factorisations untouched (f64)."""
    from alfi_tpu.config import set_mg_store

    set_mg_store(jnp.float32)
    try:
        s = _solver(stabilisation_type="supg")
        s.solve(1)
        state, params = _setup_state(s)
    finally:
        set_mg_store(real_dtype)
    import jax

    top = state["tensors"][-1]
    assert isinstance(top, dict) and top["M"].dtype == jnp.float32
    assert all(
        leaf.dtype == jnp.float64
        for leaf in jax.tree.leaves(state["patch_lufacs"][-1])
        if jnp.issubdtype(leaf.dtype, jnp.floating))
    # and the apply at f32 storage matches the f64 apply to ~eps32
    set_mg_store(real_dtype)
    s2 = _solver(stabilisation_type="supg")
    s2.solve(1)
    state64, _ = _setup_state(s2)
    L = s.vmg.nlevels - 1
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(
        (s.vmg.levels[L].V.ndof, s.vmg.d)))
    r32 = s.vmg.level_apply(L, state["tensors"][L], v,
                            ftensors=state["ftensors"][L])
    r64 = s2.vmg.level_apply(L, state64["tensors"][L], v,
                             ftensors=state64["ftensors"][L])
    assert r32.dtype == jnp.float64
    rel = float(jnp.linalg.norm(r32 - r64) / jnp.linalg.norm(r64))
    assert rel < 1e-5, rel
