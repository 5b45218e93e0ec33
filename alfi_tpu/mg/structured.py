"""Sliced patch gather/scatter on structured meshes — gathers at HBM speed.

The additive star-patch apply is three steps: gather the patch-local
residual rows, batched-GEMV against the stored patch inverses, scatter
the correction back.  On TPU the gathers dominate by two orders of
magnitude (random fetches cost ~8-16 cycles each;
results/logs/gather_microbench.log, roofline_patches.log — the
reference's equivalent loop is PCPatch's scatter/solve/gather,
/root/reference/alfi/solver.py:313-344 + relaxation.py).

On the generated benchmark meshes the geometric entity numbering
(mesh/renumber.py) makes the patch dof table AFFINE over the interior
seed grid: flat dof of slot-group j of the patch at grid position
(x, y) is

    dofs[p(x, y), j*d + t]  =  s_j + by_j * y + d * x + t

so gathering slot j for ALL interior patches is a contiguous slice of
the residual vector reshaped to (ny, by_j) — a dense DMA instead of
ny*nx random fetches — and the scatter-add transpose is the same slices
as padded dense adds.  Boundary patches (a 1D fringe, a few percent of
the total) keep the generic table path.

This module is pure detection + closure construction: it makes NO
assumptions about how the mesh was generated.  `detect` verifies the
affine property exactly, slot by slot, against the actual dof table and
declines (returns None) on any mismatch — gmsh imports, bary meshes,
distributed block-local patchsets and Schöberl cell patches all fall
back to the generic gather/scatter unchanged.

3D status: the detection and gather/scatter are dimension-general
(extents/strides below), and the geometric entity numbering has a 3D
mode (mesh/renumber.py, ALFI_TPU_GEOM_NUMBERING_3D=1 — opt-in because
the checkpoint numbering tag changes).  Measured on ldc3d meshes the
single-class assumption does NOT yet hold: the structured tet lattice
has period-2 interior vertex CLASSES with different star sizes (8 of
27 interior patches are full-size at baseN=2 nref=1), so slicing 3D
requires per-parity-class layouts, each with its own m_k and GEMV
batch — strictly a generalisation of this file's machinery (split the
interior grid by (z%2, y%2, x%2), detect each class against its own
slot table).  Until that lands, 3D declines here and keeps the
gather-table path.
"""

from __future__ import annotations

import os

import numpy as np


def struct_patch_enabled():
    return os.environ.get("ALFI_TPU_STRUCT_PATCH", "1") == "1"


class StructuredLayout:
    """Detected slice structure of a PatchSet (host-side, static).

    order    (np,)  patch permutation: interior grid patches first in
                    (z,) (y, x) lex order, the boundary fringe after
    ni       int    number of interior (sliced) patches = prod(extents)
    extents  tuple  interior seed-grid extents, (ny, nx) or (nz, ny, nx)
    starts   (m/d,) flat-dof start of each slot group at the grid origin
    strides  (m/d, dim-1) outer-axis strides of each slot group —
                    [by] in 2D, [bz, by] in 3D (the x-stride is always
                    exactly d, i.e. components contiguous)
    pad      int    rows to append to the flat vector so every outer
                    slice [s, s + n_outer * stride_outer) is in range
    """

    def __init__(self, order, ni, extents, starts, strides, pad):
        self.order = order
        self.ni = ni
        self.extents = tuple(int(e) for e in extents)
        self.starts = starts
        self.strides = strides
        self.pad = pad

    # 2D-compat accessors (existing consumers/tests)
    @property
    def ny(self):
        return self.extents[-2]

    @property
    def nx(self):
        return self.extents[-1]

    @property
    def bys(self):
        return self.strides[:, -1]


def _grid_coords(points):
    """Integer grid coordinates of points on a uniform grid (any
    dimension), or None if the points do not sit on one."""
    out = []
    for c in range(points.shape[1]):
        v = points[:, c]
        u = np.unique(v)
        if u.size < 2:
            return None
        h = np.diff(u).min()
        if h <= 0:
            return None
        g = (v - u[0]) / h
        gi = np.rint(g).astype(np.int64)
        if np.abs(g - gi).max() > 1e-8:
            return None
        out.append(gi)
    return out


def detect(patchset):
    """Affine-slice detection (2D and 3D grids); StructuredLayout or
    None.  The dof of component t of slot group j of the interior patch
    at grid position (z, y, x) must satisfy EXACTLY

        dofs = s_j + bz_j*z + by_j*y + d*x + t

    (no bz term in 2D); every check is against the actual dof table, so
    unstructured meshes simply decline."""
    if not struct_patch_enabled():
        return None
    seeds = getattr(patchset, "seed_points", None)
    m, d = patchset.m, patchset.space_d
    if (seeds is None or seeds.ndim != 2 or seeds.shape[1] not in (2, 3)
            or m == 0 or d < 1 or m % d):
        return None
    g = _grid_coords(np.asarray(seeds))
    if g is None:
        return None
    dim = len(g)
    full = patchset.sizes == m
    idx = np.where(full)[0]
    if idx.size < 2 ** dim:
        return None
    # outer-major coordinate list: (z,) y, x
    coords = [g[c][idx] for c in range(dim - 1, -1, -1)]
    mins = [c.min() for c in coords]
    exts = [int(c.max() - c.min() + 1) for c in coords]
    if any(e < 2 for e in exts) or idx.size != int(np.prod(exts)):
        return None
    rel = [c - c.min() for c in coords]
    bitmap = np.zeros(exts, dtype=bool)
    bitmap[tuple(rel)] = True
    if not bitmap.all():
        return None
    # interior patches in (z, y, x) lex order, x fastest
    lex = idx[np.lexsort(tuple(rel[::-1]))]
    R = [g[c][lex] - mins[dim - 1 - c] for c in range(dim - 1, -1, -1)]
    X = R[-1].astype(np.int64)
    D = patchset.dofs[lex]  # (ni, m) flat dofs, all active
    md = m // d
    starts = np.zeros(md, dtype=np.int64)
    strides = np.zeros((md, dim - 1), dtype=np.int64)
    for j in range(md):
        base = D[:, j * d]
        # solve base = s + sum_a stride_a * R_a + d*X exactly
        r = base - d * X
        origin = np.all([R[a] == 0 for a in range(dim - 1)], axis=0)
        if not (r[origin] == r[origin][0]).all():
            return None
        s = int(r[origin][0])
        rr = r - s
        expect = np.zeros_like(rr)
        # nested-window bound: each outer stride must cover the full
        # window of the axis inside it (by >= d*nx, bz >= ny*by)
        lower = d * exts[-1]
        for a in range(dim - 2, -1, -1):  # Y, then (3D) Z
            unit = np.all(
                [R[b] == (1 if b == a else 0)
                 for b in range(dim - 1)], axis=0)
            if not unit.any():
                return None
            st = int((rr - expect)[unit][0])
            if st < lower:
                return None
            strides[j, a] = st
            expect = expect + st * R[a].astype(np.int64)
            lower = st * exts[a]
        if not np.array_equal(rr, expect):
            return None
        # the d components of the group must be consecutive
        exp = base[:, None] + np.arange(d)[None, :]
        if not np.array_equal(D[:, j * d:(j + 1) * d], exp):
            return None
        starts[j] = s
    rest = np.setdiff1d(np.arange(patchset.npatches), lex,
                        assume_unique=False)
    order = np.concatenate([lex, rest])
    pad = max(int((starts + exts[0] * strides[:, 0]).max())
              - patchset.nflat, 0)
    return StructuredLayout(order, lex.size, exts, starts, strides, pad)


def reorder_patchset(patchset, order):
    """Permute PatchSet rows in place (interior grid first)."""
    for name in ("dofs", "active", "cells", "l2p", "sizes",
                 "seed_points"):
        arr = getattr(patchset, name, None)
        if arr is not None:
            setattr(patchset, name, arr[order])


def gather_scatter(patchset, layout):
    """Slice-based (gather, scatter) pair in the PATCH-MINOR (m, np)
    vector layout (feeds _ExplicitInverseFactorization.solve_t).
    ``patchset`` must already be reordered by ``layout.order``."""
    import jax.numpy as jnp

    from ..utils.scatter import make_gather_sum

    m, d = patchset.m, patchset.space_d
    md = m // d
    ni = layout.ni
    exts = layout.extents  # (ny, nx) or (nz, ny, nx)
    dim = len(exts)
    nx = exts[-1]
    starts = [int(s) for s in layout.starts]
    strides = [[int(b) for b in row] for row in layout.strides]
    pad = int(layout.pad)
    nflat = patchset.nflat
    nb = patchset.npatches - ni
    if nb:
        dofs_b_np = patchset.dofs[ni:]  # (nb, m), pad = nflat
        dofs_b = jnp.asarray(dofs_b_np)
        active_b = jnp.asarray(patchset.active[ni:])
        # compact the boundary scatter: a gather-sum with nout=nflat
        # would pay a permutation gather over the WHOLE vector for a
        # fringe that touches ~1% of it (measured 3 ms at nref=3);
        # instead sum into the ~nbd touched dofs and do ONE small
        # sorted-unique scatter-add
        bd = np.unique(dofs_b_np[dofs_b_np < nflat])
        pos = np.searchsorted(bd, np.clip(dofs_b_np, 0, nflat - 1))
        pos = np.where(dofs_b_np < nflat, pos, bd.size)
        bsum = make_gather_sum(pos, bd.size)
        bd_j = jnp.asarray(bd)

    def gather(r_flat):
        rpad = jnp.concatenate(
            [r_flat, jnp.zeros((pad + 1,), dtype=r_flat.dtype)])
        parts = []
        for j in range(md):
            s = starts[j]
            if dim == 2:
                (by,) = strides[j]
                ny = exts[0]
                seg = rpad[s:s + ny * by].reshape(ny, by)[:, :d * nx]
            else:
                bz, by = strides[j]
                nz, ny = exts[0], exts[1]
                seg = rpad[s:s + nz * bz].reshape(nz, bz)
                seg = seg[:, :ny * by].reshape(nz, ny, by)[:, :, :d * nx]
            # (..., nx, d) -> (d, ni): component t of slot group j
            parts.append(seg.reshape(ni, d).T)
        xi = jnp.concatenate(parts, axis=0)  # (m, ni)
        if not nb:
            return xi
        xb = rpad[:nflat + 1][dofs_b].T  # (m, nb)
        return jnp.concatenate([xi, xb], axis=1)

    def scatter(xp, dtype):
        xi = xp[:, :ni].astype(dtype)
        total = nflat + pad
        out = jnp.zeros((total,), dtype=dtype)
        for j in range(md):
            s = starts[j]
            if dim == 2:
                (by,) = strides[j]
                ny = exts[0]
                seg = xi[j * d:(j + 1) * d].T.reshape(ny, d * nx)
                seg = jnp.pad(seg, ((0, 0), (0, by - d * nx)))
                win = ny * by
            else:
                bz, by = strides[j]
                nz, ny = exts[0], exts[1]
                seg = xi[j * d:(j + 1) * d].T.reshape(nz, ny, d * nx)
                seg = jnp.pad(seg, ((0, 0), (0, 0), (0, by - d * nx)))
                seg = seg.reshape(nz, ny * by)
                seg = jnp.pad(seg, ((0, 0), (0, bz - ny * by)))
                win = nz * bz
            out = out + jnp.pad(
                seg.reshape(win), (s, total - s - win))
        out = out[:nflat]
        if nb:
            xb = jnp.where(active_b, xp[:, ni:].T, 0).astype(dtype)
            out = out.at[bd_j].add(
                bsum(xb), indices_are_sorted=True, unique_indices=True)
        return out

    return gather, scatter
