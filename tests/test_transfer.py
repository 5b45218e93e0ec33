"""Grid-transfer unit tests (SURVEY.md §4: transfer adjointness,
polynomial reproduction, injection consistency)."""

import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu.config import real_dtype
from alfi_tpu.fem import VectorFunctionSpace, lagrange
from alfi_tpu.mesh import mesh_hierarchy, rectangle_mesh, unit_cube_mesh
from alfi_tpu.mg.transfer import injection, prolongation


def make_spaces(kind, dim, k, nref=2):
    if dim == 2:
        base = rectangle_mesh(3, 3, 2, 2)
    else:
        base = unit_cube_mesh(2)
    mh = mesh_hierarchy(base, kind, nref)
    elem = lagrange(dim, k)
    spaces = [VectorFunctionSpace(m, elem) for m in mh]
    return mh, spaces


def poly(x, k):
    """A vector polynomial of total degree k (reproduced exactly by Pk)."""
    out0 = x[:, 0] ** k + 2.0 * x[:, 1] + 1.0
    out1 = (x[:, 0] + x[:, 1]) ** k - x[:, 0]
    return np.stack([out0, out1] + ([x[:, 0] * x[:, 1]] if x.shape[1] == 3
                                    else []), axis=1)[:, : x.shape[1]]


@pytest.mark.parametrize("kind", ["uniform", "bary", "uniformbary"])
@pytest.mark.parametrize("k", [1, 2])
def test_prolongation_reproduces_polynomials(kind, k):
    mh, spaces = make_spaces(kind, 2, k)
    for l in range(len(mh) - 1):
        P = prolongation(mh, l, spaces[l], spaces[l + 1])
        uc = jnp.asarray(poly(spaces[l].dof_coords, k), dtype=real_dtype)
        uf = P.apply(uc)
        exact = poly(spaces[l + 1].dof_coords, k)
        assert np.max(np.abs(np.asarray(uf) - exact)) < 1e-11


@pytest.mark.parametrize("kind", ["uniform", "bary"])
def test_restriction_is_adjoint(kind):
    mh, spaces = make_spaces(kind, 2, 2)
    P = prolongation(mh, 0, spaces[0], spaces[1])
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.normal(size=(spaces[0].ndof, 2)))
    vf = jnp.asarray(rng.normal(size=(spaces[1].ndof, 2)))
    lhs = float(jnp.vdot(P.apply(uc), vf))
    rhs = float(jnp.vdot(uc, P.apply_transpose(vf)))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


@pytest.mark.parametrize("kind", ["uniform", "bary"])
def test_injection_left_inverse_of_prolongation(kind):
    mh, spaces = make_spaces(kind, 2, 2)
    P = prolongation(mh, 0, spaces[0], spaces[1])
    I = injection(mh, 0, spaces[1], spaces[0])
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.normal(size=(spaces[0].ndof, 2)))
    back = I.apply(P.apply(uc))
    assert float(jnp.max(jnp.abs(back - uc))) < 1e-11


def test_prolongation_3d_uniform():
    mh, spaces = make_spaces("uniform", 3, 2, nref=1)
    P = prolongation(mh, 0, spaces[0], spaces[1])
    uc = jnp.asarray(poly(spaces[0].dof_coords, 2), dtype=real_dtype)
    uf = P.apply(uc)
    exact = poly(spaces[1].dof_coords, 2)
    assert np.max(np.abs(np.asarray(uf) - exact)) < 1e-11
