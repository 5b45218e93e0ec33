"""BubbleTransfer unit tests (the [P1+FB]^3 flux fix,
/root/reference/alfi/bubble.py)."""

import jax.numpy as jnp
import numpy as np

from alfi_tpu.fem import VectorFunctionSpace, pk_facet_bubble
from alfi_tpu.mesh import mesh_hierarchy, unit_cube_mesh
from alfi_tpu.mg.bubble import BubbleTransfer


def setup():
    mh = mesh_hierarchy(unit_cube_mesh(2), "uniform", 1)
    elem = pk_facet_bubble(3, 1)
    return mh, VectorFunctionSpace(mh[0], elem), \
        VectorFunctionSpace(mh[1], elem)


def test_linear_fields_exact():
    mh, Vc, Vf = setup()
    T = BubbleTransfer(mh, 0)

    def lin(x):
        return np.stack([x[:, 0] + 2 * x[:, 1], x[:, 2] - x[:, 0],
                         x[:, 1]], 1)

    uf = T.apply(jnp.asarray(lin(Vc.dof_coords)))
    assert float(jnp.max(jnp.abs(uf - lin(Vf.dof_coords)))) < 1e-12


def test_restrict_is_adjoint():
    mh, Vc, Vf = setup()
    T = BubbleTransfer(mh, 0)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(Vc.ndof, 3)))
    b = jnp.asarray(rng.normal(size=(Vf.ndof, 3)))
    lhs = float(jnp.vdot(T.apply(a), b))
    rhs = float(jnp.vdot(a, T.apply_transpose(b)))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)


def test_bubble_normal_flux_scaled():
    """A pure coarse bubble's prolongation must carry 1/0.625 x the
    normal flux of the plain nodal interpolation through coarse facets."""
    mh, Vc, Vf = setup()
    T = BubbleTransfer(mh, 0)
    from alfi_tpu.mg.transfer import prolongation

    P = prolongation(mh, 0, Vc, Vf)
    # a coarse field with only one interior facet bubble, normal-directed
    mesh = mh[0]
    f = int(mesh.interior_facets[0])
    n = np.cross(
        mesh.vertices[mesh.facet_vertices[f][1]]
        - mesh.vertices[mesh.facet_vertices[f][0]],
        mesh.vertices[mesh.facet_vertices[f][2]]
        - mesh.vertices[mesh.facet_vertices[f][0]])
    n /= np.linalg.norm(n)
    uc = np.zeros((Vc.ndof, 3))
    uc[mesh.num_vertices + f] = n
    uc = jnp.asarray(uc)
    fixed = np.asarray(T.apply(uc))
    plain = np.asarray(P.apply(uc))
    # compare the fine dof amplitudes: the corrected field is exactly
    # 1.6x the plain interpolation of this normal bubble
    ratio = (np.linalg.norm(fixed) / np.linalg.norm(plain))
    assert abs(ratio - 1.6) < 1e-10


def test_as_table_matches_apply():
    """The flattened matrix-weighted gather table (the distributed
    solver's representation) reproduces apply/apply_transpose exactly."""
    mh, Vc, Vf = setup()
    T = BubbleTransfer(mh, 0)
    idx, W = T.as_table()
    assert idx.shape[0] == Vf.ndof and W.shape[-2:] == (3, 3)
    rng = np.random.default_rng(1)
    uc = rng.normal(size=(Vc.ndof, 3))
    ucp = np.concatenate([uc, np.zeros((1, 3))], axis=0)  # dump row
    uf_tab = np.einsum("lnab,lnb->la", W, ucp[idx])
    uf = np.asarray(T.apply(jnp.asarray(uc)))
    assert np.max(np.abs(uf_tab - uf)) < 1e-12

    rf = rng.normal(size=(Vf.ndof, 3))
    rc_tab = np.zeros((Vc.ndof + 1, 3))
    np.add.at(rc_tab, idx, np.einsum("lnab,la->lnb", W, rf))
    rc = np.asarray(T.apply_transpose(jnp.asarray(rf)))
    assert np.max(np.abs(rc_tab[:-1] - rc)) < 1e-12
