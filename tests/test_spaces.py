import numpy as np
import pytest

from alfi_tpu.fem.element import dg_lagrange, facet_bubble, lagrange, pk_facet_bubble
from alfi_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
from alfi_tpu.mesh import unit_cube_mesh, unit_square_mesh, refine_uniform


@pytest.mark.parametrize("d,k", [(2, 1), (2, 2), (2, 3), (2, 4), (3, 1), (3, 2), (3, 3), (3, 4)])
def test_cg_conformity(d, k):
    mesh = unit_square_mesh(3) if d == 2 else unit_cube_mesh(2)
    V = FunctionSpace(mesh, lagrange(d, k))
    # shared dofs must map to identical physical coordinates from every cell
    el = V.element
    v = mesh.cell_coords()
    J = np.transpose(v[:, 1:, :] - v[:, :1, :], (0, 2, 1))
    phys = v[:, 0, None, :] + np.einsum("cde,ne->cnd", J, el.nodes)
    coords_from_cells = np.zeros((V.ndof, d))
    seen = np.zeros(V.ndof, dtype=bool)
    ok = True
    flat_dofs = V.cell_dofs.ravel()
    flat_phys = phys.reshape(-1, d)
    for dof, x in zip(flat_dofs, flat_phys):
        if seen[dof]:
            ok &= np.allclose(coords_from_cells[dof], x, atol=1e-12)
        else:
            coords_from_cells[dof] = x
            seen[dof] = True
    assert ok
    assert seen.all()
    # expected dof count
    ne = mesh.num_facets if d == 2 else mesh.num_edges
    nf_int = (k - 1) * (k - 2) // 2 if d == 3 else 0
    ncell_int = len(
        [1 for a in np.ndindex(*([k] * (d + 1))) if all(x >= 1 for x in a) and sum(a) == k]
    ) if k >= d + 1 else 0
    # simpler: dimension of Pk = C(k+d, d) per cell minus shared
    from math import comb

    expect = (
        mesh.num_vertices
        + ne * (k - 1)
        + (mesh.num_facets * nf_int if d == 3 else 0)
    )
    if d == 2:
        expect += mesh.num_cells * max(0, comb(k - 1, 2))
    else:
        expect += mesh.num_cells * max(0, comb(k - 1, 3))
    assert V.ndof == expect


@pytest.mark.parametrize("d", [2, 3])
def test_interpolation_continuity(d):
    """Interpolating a polynomial via dof_coords gives a conforming field
    whose cellwise evaluation is continuous across facets."""
    mesh = unit_square_mesh(2) if d == 2 else unit_cube_mesh(2)
    for k in (2, 3):
        V = FunctionSpace(mesh, lagrange(d, k))
        f = lambda x: (x.sum(axis=-1)) ** k
        g = f(V.dof_coords)
        # evaluate at random interior points of each facet from both cells
        el = V.element
        rng = np.random.RandomState(0)
        interior = mesh.interior_facets[:10]
        for fct in interior:
            c0, c1 = mesh.facet_cells[fct]
            lam = rng.dirichlet(np.ones(d), size=3)
            pts_phys = lam @ mesh.vertices[mesh.facet_vertices[fct]]
            for c in (c0, c1):
                v = mesh.vertices[mesh.cells[c]]
                Jc = (v[1:] - v[:1]).T
                ref = np.linalg.solve(Jc, (pts_phys - v[0]).T).T
                vals = el.tabulate(ref) @ g[V.cell_dofs[c]]
                assert np.allclose(vals, f(pts_phys), atol=1e-9)


def test_boundary_dofs():
    mesh = unit_square_mesh(4)
    V = FunctionSpace(mesh, lagrange(2, 2))
    bd = V.boundary_dofs()
    x = V.dof_coords[bd]
    on_b = (
        np.isclose(x[:, 0], 0) | np.isclose(x[:, 0], 1)
        | np.isclose(x[:, 1], 0) | np.isclose(x[:, 1], 1)
    )
    assert on_b.all()
    # count: boundary has 16 edges -> 16 vertices + 16 midpoints
    assert len(bd) == 32
    # tagged subsets
    left = V.boundary_dofs(1)
    assert np.allclose(V.dof_coords[left][:, 0], 0.0)


def test_fb_space():
    mesh = unit_cube_mesh(2)
    V = FunctionSpace(mesh, pk_facet_bubble(3, 1))
    assert V.ndof == mesh.num_vertices + mesh.num_facets
    W = FunctionSpace(mesh, facet_bubble(3))
    assert W.ndof == mesh.num_facets


def test_dg_space():
    mesh = unit_square_mesh(2)
    Q = FunctionSpace(mesh, dg_lagrange(2, 0))
    assert Q.ndof == mesh.num_cells
    Q1 = FunctionSpace(mesh, dg_lagrange(2, 1))
    assert Q1.ndof == 3 * mesh.num_cells


def test_facet_closure_dofs():
    mesh = unit_cube_mesh(2)
    V = FunctionSpace(mesh, lagrange(3, 2))
    f = mesh.interior_facets[:1]
    dofs = V.facet_closure_dofs(f)
    # a triangle facet closure for P2: 3 vertices + 3 edge midpoints
    assert len(dofs) == 6
