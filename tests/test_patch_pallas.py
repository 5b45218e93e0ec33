"""Patch-minor (transposed) inverse application + Pallas kernel
(solvers/patch_pallas.py): the layout that removes XLA's (8, 128)
minor-dim tile padding from the bandwidth-bound smoother apply.

On CPU the Pallas kernel runs in interpreter mode; parity of all three
applies (batch-major einsum, patch-minor XLA reduce, patch-minor
Pallas) is the gate that lets the TPU pick any of them by env toggle
(ALFI_TPU_PATCH_APPLY=f32t / f32p) without changing results.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu.solvers import batched_lu
from alfi_tpu.solvers.batched_lu import _ExplicitInverseFactorization
from alfi_tpu.solvers.patch_pallas import (
    apply_transposed_pallas,
    apply_transposed_xla,
    pad_patch_axis,
)


def _random_inverses(seed=0, npat=37, m=9):
    rng = np.random.default_rng(seed)
    inv = rng.standard_normal((npat, m, m))
    rp = rng.standard_normal((npat, m))
    ref = np.einsum("pij,pj->pi", inv, rp)
    return inv, rp, ref


@pytest.mark.parametrize("m,npat", [(9, 37), (14, 130), (33, 257)])
def test_transposed_applies_match_einsum(m, npat):
    inv, rp, ref = _random_inverses(m=m, npat=npat)
    fac = jnp.moveaxis(jnp.asarray(inv, dtype=jnp.float32), 0, -1)
    rpt = jnp.asarray(rp.T, dtype=jnp.float32)
    out_xla = np.asarray(apply_transposed_xla(fac, rpt)).T
    out_pl = np.asarray(
        apply_transposed_pallas(pad_patch_axis(fac), rpt)).T
    scale = np.abs(ref).max()
    assert np.abs(out_xla - ref).max() / scale < 1e-5
    assert np.abs(out_pl - ref).max() / scale < 1e-5
    # padded and unpadded factors must agree exactly
    out_pl2 = np.asarray(apply_transposed_pallas(fac, rpt)).T
    assert np.array_equal(out_pl, out_pl2)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_factorization_transposed_matches_numpy(use_pallas):
    """AL-like (gamma-dominated) operators through the full
    factor+solve interface, batch-major compat path."""
    rng = np.random.default_rng(2)
    npat, m = 11, 9
    A = rng.standard_normal((npat, m, m))
    Bt = rng.standard_normal((npat, m, 3))
    A = A + 1e4 * np.einsum("bip,bjp->bij", Bt, Bt) + 20 * np.eye(m)
    b = rng.standard_normal((npat, m))
    ref = np.stack([np.linalg.solve(Ai, bi) for Ai, bi in zip(A, b)])
    fs = _ExplicitInverseFactorization(
        jnp.float32, transposed=True, use_pallas=use_pallas)
    fac = fs.factor(jnp.asarray(A))
    assert fac.shape[-1] >= npat and fac.shape[0] == m
    x = fs.solve(fac, jnp.asarray(b))
    rel = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


@pytest.fixture
def patch_fs(request):
    """Swap the cached 'patch' factorisation, restore afterwards."""
    saved = dict(batched_lu._fs)

    def set_fs(fs):
        batched_lu._fs["patch"] = fs

    yield set_fs
    batched_lu._fs.clear()
    batched_lu._fs.update(saved)


@pytest.mark.parametrize("variant",
                         ["f32", "f32t", "f32p", "bf16t", "bf16p"])
def test_patch_solver_end_to_end(patch_fs, variant):
    """build_patch_solver through a real star patchset: the transposed
    gather/apply/scatter pipeline must reproduce the batch-major f64
    path to f32 accuracy."""
    from tests.test_woodbury import make_form

    from alfi_tpu.mg.patches import build_patch_solver, star_patches

    form, bcset = make_form("cell_avg")
    mask = np.asarray(bcset.mask[0]).reshape(-1)
    ps = star_patches(form.V, mask)
    wind = jnp.zeros((form.V.ndof, 2))
    params = {"nu": jnp.asarray(0.01), "gamma": jnp.asarray(1e2),
              "advect": jnp.asarray(1.0)}
    T = form.velocity_element_tensors(params, wind)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=(form.V.ndof * 2,))) * mask

    patch_fs(_ExplicitInverseFactorization())  # f64 reference
    f0, a0 = build_patch_solver(ps)
    x0 = np.asarray(a0(f0(T), r))

    dt = jnp.bfloat16 if variant.startswith("bf16") else jnp.float32
    patch_fs(_ExplicitInverseFactorization(
        dt, transposed=variant != "f32",
        use_pallas=variant in ("f32p", "bf16p")))
    f1, a1 = build_patch_solver(ps)
    x1 = np.asarray(a1(f1(T), r))
    rel = np.linalg.norm(x1 - x0) / np.linalg.norm(x0)
    # bf16 stores the inverses with an 8-bit mantissa: ~1e-2 relative,
    # a smoother-quality (not solution-accuracy) question
    tol = 3e-2 if variant.startswith("bf16") else 1e-5
    assert rel < tol, (variant, rel)


def test_multiplicative_sweep_transposed(patch_fs):
    """Color-sweep factor indexing is batch-axis aware."""
    from tests.test_woodbury import make_form

    from alfi_tpu.mg.patches import (
        build_multiplicative_solver,
        star_patches,
    )

    form, bcset = make_form("cell_avg")
    mask = np.asarray(bcset.mask[0]).reshape(-1)
    ps = star_patches(form.V, mask)
    wind = jnp.zeros((form.V.ndof, 2))
    params = {"nu": jnp.asarray(0.01), "gamma": jnp.asarray(1e2),
              "advect": jnp.asarray(1.0)}
    T = form.velocity_element_tensors(params, wind)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(form.V.ndof * 2,))) * mask

    def make_aop(T):
        from alfi_tpu.solvers.linear import assemble_dense_from_tensors

        A = assemble_dense_from_tensors(
            form, T, jnp.asarray(mask.reshape(-1, 2)))
        return lambda v: A @ v

    Aop = make_aop(T)
    patch_fs(_ExplicitInverseFactorization())
    f0, a0 = build_multiplicative_solver(ps)
    x0 = np.asarray(a0(f0(T), r, Aop))

    patch_fs(_ExplicitInverseFactorization(jnp.float32,
                                           transposed=True))
    f1, a1 = build_multiplicative_solver(ps)
    x1 = np.asarray(a1(f1(T), r, Aop))
    rel = np.linalg.norm(x1 - x0) / np.linalg.norm(x0)
    assert rel < 1e-4, rel
