"""gmsh_read against REAL reference mesh assets (not synthetic files).

Fixtures are byte-copies of the reference's checked-in Gmsh MSH 2.2
meshes (/root/reference/examples/bfs2d/coarse12.msh,
bfs3d/coarse55.msh — mesh data, not code; dfg ships no .msh in the
reference, its meshes are generated from .geo).  Gates: geometry and
physical-tag parsing, boundary completeness, and the bfs problems
consuming the files end-to-end through their ``msh=`` path."""

import os

import numpy as np
import pytest

from alfi_tpu.mesh import gmsh_read
from alfi_tpu.problems import (
    ThreeDimBackwardsFacingStepProblem,
    TwoDimBackwardsFacingStepProblem,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
BFS2D = os.path.join(FIX, "bfs2d_coarse12.msh")
BFS3D = os.path.join(FIX, "bfs3d_coarse55.msh")


def _facet_measures(mesh):
    """(total boundary measure, per-tag measure dict)."""
    bf = mesh.exterior_facets
    tags = mesh.facet_markers[bf]
    fv = mesh.facet_vertices[bf]
    pts = mesh.vertices[fv]  # (nbf, d, dim)
    if mesh.dim == 2:
        meas = np.linalg.norm(pts[:, 1] - pts[:, 0], axis=1)
    else:
        e1 = pts[:, 1] - pts[:, 0]
        e2 = pts[:, 2] - pts[:, 0]
        meas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    per_tag = {int(t): float(meas[tags == t].sum())
               for t in np.unique(tags)}
    return float(meas.sum()), per_tag


def test_bfs2d_reference_mesh_parses():
    mesh = gmsh_read(BFS2D)
    assert mesh.dim == 2
    assert mesh.num_cells > 1000
    # domain [0,10]x[0,2] minus the [0,1]x[0,1] step
    assert np.allclose(mesh.vertices.min(axis=0), [0.0, 0.0])
    assert np.allclose(mesh.vertices.max(axis=0), [10.0, 2.0])
    total, per_tag = _facet_measures(mesh)
    # perimeter: top 10 + right 2 + bottom 9 + step 1+1 + inflow 1 = 24
    assert abs(total - 24.0) < 1e-8, total
    assert abs(per_tag[1] - 1.0) < 1e-8      # Inflow x=0, y in [1,2]
    assert abs(per_tag[3] - 2.0) < 1e-8      # Outflow x=10
    assert abs(per_tag[2] - 21.0) < 1e-8     # NoSlip = the rest
    # all cells positively oriented with sane areas
    v = mesh.vertices[mesh.cells]
    e1, e2 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    areas = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert areas.min() > 0
    assert abs(areas.sum() - 19.0) < 1e-8    # 10*2 - 1*1


def test_bfs3d_reference_mesh_parses():
    mesh = gmsh_read(BFS3D)
    assert mesh.dim == 3
    assert mesh.num_cells > 500
    total, per_tag = _facet_measures(mesh)
    # tags used by the reference problem: 1 = inflow (area 1), 3 = walls
    assert abs(per_tag[1] - 1.0) < 1e-8
    assert 3 in per_tag
    # volume = (10*2 - 1*1) * 1
    v = mesh.vertices[mesh.cells]
    vols = np.abs(np.linalg.det(
        np.stack([v[:, i] - v[:, 0] for i in (1, 2, 3)], axis=1))) / 6.0
    assert vols.min() > 0
    assert abs(vols.sum() - 19.0) < 1e-6


def test_bfs2d_problem_consumes_reference_mesh():
    problem = TwoDimBackwardsFacingStepProblem(msh=BFS2D)
    mh = problem.mesh_hierarchy("uniform", 1)
    assert mh[1].num_cells == 4 * mh[0].num_cells
    # BCs attach to the real tags: inflow dofs carry the Poiseuille
    # profile, and it vanishes below the step (y <= 1)
    from alfi_tpu.fem import (
        FunctionSpace,
        MixedFunctionSpace,
        VectorFunctionSpace,
        dg_lagrange,
        lagrange,
    )
    from alfi_tpu.fem.bcs import BCSet

    V = VectorFunctionSpace(mh[1], lagrange(2, 2))
    Q = FunctionSpace(mh[1], dg_lagrange(2, 0))
    Z = MixedFunctionSpace(V, Q)
    bcset = BCSet(Z, problem.bcs(Z))
    z = bcset.apply(Z.zero())
    u = np.asarray(z[0])
    assert np.max(u[:, 0]) > 0.9  # peak inflow ~ 1.0 at y=1.5
    assert np.all(u[:, 1] == 0.0)


def test_bfs3d_problem_consumes_reference_mesh():
    problem = ThreeDimBackwardsFacingStepProblem(msh=BFS3D)
    mh = problem.mesh_hierarchy("uniform", 1)
    assert mh[1].num_cells == 8 * mh[0].num_cells
