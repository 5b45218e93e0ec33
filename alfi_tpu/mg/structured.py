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
"""

from __future__ import annotations

import os

import numpy as np


def struct_patch_enabled():
    return os.environ.get("ALFI_TPU_STRUCT_PATCH", "1") == "1"


class StructuredLayout:
    """Detected slice structure of a PatchSet (host-side, static).

    order    (np,)  patch permutation: interior grid patches first in
                    (y, x) lex order, the boundary fringe after
    ni       int    number of interior (sliced) patches = ny * nx
    ny, nx   int    interior seed-grid extents
    starts   (m/d,) flat-dof start of each slot group at grid (0, 0)
    bys      (m/d,) y-stride of each slot group
    pad      int    rows to append to the flat vector so every slice
                    [s, s + ny * by) is in range
    """

    def __init__(self, order, ni, ny, nx, starts, bys, pad):
        self.order = order
        self.ni = ni
        self.ny = ny
        self.nx = nx
        self.starts = starts
        self.bys = bys
        self.pad = pad


def _grid_coords(points):
    """Integer grid coordinates of points on a uniform 2D grid, or
    None if the points do not sit on one."""
    out = []
    for c in range(2):
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
    """Affine-slice detection; StructuredLayout or None."""
    if not struct_patch_enabled():
        return None
    seeds = getattr(patchset, "seed_points", None)
    m, d = patchset.m, patchset.space_d
    if (seeds is None or seeds.ndim != 2 or seeds.shape[1] != 2
            or m == 0 or d < 1 or m % d):
        return None
    g = _grid_coords(np.asarray(seeds))
    if g is None:
        return None
    gx, gy = g
    full = patchset.sizes == m
    idx = np.where(full)[0]
    if idx.size < 4:
        return None
    fx, fy = gx[idx], gy[idx]
    x0, x1 = fx.min(), fx.max()
    y0, y1 = fy.min(), fy.max()
    nx, ny = int(x1 - x0 + 1), int(y1 - y0 + 1)
    if nx < 2 or ny < 2 or idx.size != nx * ny:
        return None
    bitmap = np.zeros((ny, nx), dtype=bool)
    bitmap[fy - y0, fx - x0] = True
    if not bitmap.all():
        return None
    # interior patches in (y, x) lex order
    lex = idx[np.lexsort((fx, fy))]
    X = (gx[lex] - x0).astype(np.int64)
    Y = (gy[lex] - y0).astype(np.int64)
    D = patchset.dofs[lex]  # (ni, m) flat dofs, all active
    md = m // d
    starts = np.zeros(md, dtype=np.int64)
    bys = np.zeros(md, dtype=np.int64)
    for j in range(md):
        base = D[:, j * d]
        # solve base = s + by*Y + d*X exactly
        r = base - d * X
        at_y0 = r[Y == 0]
        if not (at_y0 == at_y0[0]).all():
            return None
        s = int(at_y0[0])
        ry = r - s
        if ny < 2:
            return None
        at_y1 = ry[Y == 1]
        by = int(at_y1[0]) if at_y1.size else 0
        if by < d * nx or not np.array_equal(ry, by * Y):
            return None
        # the d components of the group must be consecutive
        exp = base[:, None] + np.arange(d)[None, :]
        if not np.array_equal(D[:, j * d:(j + 1) * d], exp):
            return None
        starts[j] = s
        bys[j] = by
    rest = np.setdiff1d(np.arange(patchset.npatches), lex,
                        assume_unique=False)
    order = np.concatenate([lex, rest])
    pad = max(int((starts + ny * bys).max()) - patchset.nflat, 0)
    return StructuredLayout(order, lex.size, ny, nx, starts, bys, pad)


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
    ni, ny, nx = layout.ni, layout.ny, layout.nx
    starts = [int(s) for s in layout.starts]
    bys = [int(b) for b in layout.bys]
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
            s, by = starts[j], bys[j]
            seg = rpad[s:s + ny * by].reshape(ny, by)[:, :d * nx]
            # (ny, nx, d) -> (d, ni): component t of slot group j
            seg = seg.reshape(ny * nx, d).T
            parts.append(seg)
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
            s, by = starts[j], bys[j]
            seg = xi[j * d:(j + 1) * d].T.reshape(ny, d * nx)
            seg = jnp.pad(seg, ((0, 0), (0, by - d * nx)))
            out = out + jnp.pad(
                seg.reshape(ny * by),
                (s, total - s - ny * by))
        out = out[:nflat]
        if nb:
            xb = jnp.where(active_b, xp[:, ni:].T, 0).astype(dtype)
            out = out.at[bd_j].add(
                bsum(xb), indices_are_sorted=True, unique_indices=True)
        return out

    return gather, scatter
