"""Explicit mesh-decomposition with shard_map halo exchange (SURVEY.md
§5.8 stage 8).

This is the TPU-native analogue of the reference's DMPlex partitioning +
VecScatter halo exchange (overlap-1 vertex partitions,
/root/reference/alfi/solver.py:604-605): cells are partitioned into
contiguous locality-ordered blocks, every block stores its own cells'
dofs locally (interface dofs replicated), and the assembly scatter is
completed by ONE interface all-reduce (a psum over the packed interface
buffer — the collective rides ICI).

Currently provides the distributed residual/matvec building block with a
correctness test against the global assembly; distributing the full MG
preconditioner this way is the next stage (the default multi-device path
meanwhile is GSPMD sharding of the global arrays, parallel/sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_cells(mesh, nblocks):
    """Locality-ordered contiguous cell blocks: cells sorted by centroid
    lexicographic order, split into nblocks equal chunks (padded).
    Returns (block_cells (nblocks, mc) padded with -1)."""
    cent = mesh.vertices[mesh.cells].mean(axis=1)
    order = np.lexsort(tuple(cent[:, ax] for ax in range(mesh.dim - 1,
                                                         -1, -1)))
    nc = mesh.num_cells
    mc = (nc + nblocks - 1) // nblocks
    padded = np.full(nblocks * mc, -1, dtype=np.int64)
    padded[:nc] = order
    return padded.reshape(nblocks, mc)


class DistributedResidual:
    """Block-local velocity-space residual/matvec with interface psum."""

    def __init__(self, form, bcset, mesh_axis, block_cells):
        space = form.V
        d = space.value_size
        nb, mc = block_cells.shape
        self.nb, self.mc, self.d = nb, mc, d
        cd = space.cell_dofs.astype(np.int64)
        nloc = cd.shape[1]

        # local dof tables per block
        loc_dofs, loc_cd, sizes = [], [], []
        for b in range(nb):
            cells = block_cells[b]
            cells = cells[cells >= 0]
            gd = np.unique(cd[cells])
            lookup = {g: i for i, g in enumerate(gd)}
            lcd = np.vectorize(lookup.get)(cd[cells]) if len(cells) else \
                np.zeros((0, nloc), dtype=np.int64)
            loc_dofs.append(gd)
            loc_cd.append(lcd)
            sizes.append(len(gd))
        L = max(sizes)
        self.L = L
        gdofs = np.full((nb, L), -1, dtype=np.int64)
        for b in range(nb):
            gdofs[b, : sizes[b]] = loc_dofs[b]

        # interface dofs: global dofs appearing in >1 block
        flat = gdofs[gdofs >= 0]
        uniq, counts = np.unique(flat, return_counts=True)
        shared = uniq[counts > 1]
        ns = len(shared)
        slot = {g: i for i, g in enumerate(shared)}
        # per block: (local idx, shared slot) pairs, padded
        ms = max(
            int(np.isin(gdofs[b, : sizes[b]], shared).sum())
            for b in range(nb)) if ns else 0
        lidx = np.full((nb, max(ms, 1)), L, dtype=np.int64)  # pad -> dump
        sslot = np.full((nb, max(ms, 1)), ns, dtype=np.int64)
        owner = np.full((nb, L), True)
        seen = set()
        for b in range(nb):
            gs = gdofs[b, : sizes[b]]
            mask = np.isin(gs, shared)
            ii = np.where(mask)[0]
            lidx[b, : len(ii)] = ii
            sslot[b, : len(ii)] = [slot[g] for g in gs[ii]]
            for i in range(sizes[b]):
                g = gdofs[b, i]
                if g in seen:
                    owner[b, i] = False
                seen.add(g)
            owner[b, sizes[b]:] = False
        self.ns = ns

        # padded per-block cell data
        cells_pad = np.where(block_cells >= 0, block_cells, 0)
        dead = block_cells < 0
        lcd_pad = np.zeros((nb, mc, nloc), dtype=np.int64)
        for b in range(nb):
            ncb = (block_cells[b] >= 0).sum()
            lcd_pad[b, :ncb] = loc_cd[b]
            lcd_pad[b, ncb:] = L  # dump row
        self.gdofs = jnp.asarray(np.where(gdofs >= 0, gdofs, 0))
        self.valid = jnp.asarray(gdofs >= 0)
        self.owner = jnp.asarray(owner)
        self.lcd = jnp.asarray(lcd_pad)
        self.cells = jnp.asarray(cells_pad)
        self.dead = jnp.asarray(dead)
        self.lidx = jnp.asarray(lidx)
        self.sslot = jnp.asarray(sslot)
        self.form = form
        self.mask_flat = bcset.mask[0]
        self.mesh_axis = mesh_axis

        g = form.geom
        self.jinv_b = jnp.asarray(np.asarray(g.jinv))[self.cells]
        self.detj_b = jnp.asarray(np.asarray(g.detj))[self.cells]
        self.vol_b = jnp.asarray(np.asarray(g.vol))[self.cells]

    # ------------------------------------------------------------------
    def scatter_state(self, u):
        """Global (ndof, d) -> block-local (nb, L+1, d) arrays (the +1
        row is the padding dump)."""
        ub = u[self.gdofs] * self.valid[..., None]
        return jnp.concatenate(
            [ub, jnp.zeros((self.nb, 1, self.d), dtype=u.dtype)], axis=1)

    def gather_state(self, ub):
        """Owned block-local values -> global array."""
        u = jnp.zeros((self.form.V.ndof, self.d), dtype=ub.dtype)
        w = self.owner[..., None]
        return u.at[self.gdofs].add(ub[:, :-1] * w)

    def local_velocity_residual(self, ub, wb, jinv, detj, vol, lcd, dead,
                                params):
        """One block's velocity residual on local arrays (runs inside
        shard_map; shapes carry no block axis)."""
        form = self.form
        u_loc = ub[lcd]  # (mc, nloc, d)
        w_loc = wb[lcd]
        rv = jax.vmap(
            lambda ul, wl, ji, dj, vo: form.cell_velocity_residual(
                ul, wl, ji, dj, vo, params)
        )(u_loc, w_loc, jinv, detj, vol)
        rv = jnp.where(dead[:, None, None], 0.0, rv)
        out = jnp.zeros_like(ub)
        return out.at[lcd].add(rv)

    def block_tensors(self, tensors):
        """Per-block padded element tensors (nb, mc, nld, nld)."""
        Tpad = jnp.concatenate(
            [tensors, jnp.zeros((1,) + tensors.shape[1:],
                                dtype=tensors.dtype)], axis=0)
        safe = jnp.where(self.dead, tensors.shape[0], self.cells)
        return Tpad[safe]

    def block_masks(self):
        """(nb, L+1, d) BC row masks on local dofs (+dump row)."""
        mflat = self.mask_flat  # (ndof, d)
        mb = mflat[self.gdofs] * self.valid[..., None]
        return jnp.concatenate(
            [mb, jnp.zeros((self.nb, 1, self.d), dtype=mb.dtype)],
            axis=1)

    def make_distributed_cg(self, mesh: Mesh, tensors, rtol=1e-8,
                            maxit=200):
        """A complete CG solve running INSIDE one shard_map: local
        matvecs, halo-exchange psums for the scatter completion, and
        owner-weighted psums for every dot product — the full
        communication pattern of the reference's parallel Krylov loop
        (halo VecScatter + allreduce dots, SURVEY.md §5.8)."""
        from jax import lax, shard_map

        axis = self.mesh_axis
        ns, L, d = self.ns, self.L, self.d
        from ..config import real_dtype

        Tb = self.block_tensors(tensors)
        maskb = self.block_masks()
        ownerw = jnp.concatenate(
            [self.owner.astype(real_dtype),
             jnp.zeros((self.nb, 1), dtype=real_dtype)],
            axis=1)[..., None]

        def kernel(b_loc, Tb, maskb, ownerw, lcd, dead, lidx, sslot):
            b_loc, Tb, maskb, ownerw = b_loc[0], Tb[0], maskb[0], ownerw[0]
            lcd, dead, lidx, sslot = lcd[0], dead[0], lidx[0], sslot[0]

            def exchange(r):
                buf = jnp.zeros((ns + 1, d), dtype=r.dtype)
                buf = buf.at[sslot].add(r[lidx])
                buf = lax.psum(buf, axis)
                return r.at[lidx].set(buf[sslot])

            def matvec(v):
                v0 = v * maskb
                vloc = v0[lcd]  # (mc, nld_flat?) -> flatten comps
                vloc = vloc.reshape(vloc.shape[0], -1)
                rloc = jnp.einsum("cij,cj->ci", Tb, vloc)
                rloc = jnp.where(dead[:, None], 0.0, rloc)
                r = jnp.zeros_like(v)
                r = r.at[lcd].add(rloc.reshape(len(Tb), -1, d))
                r = exchange(r)
                return maskb * r + (1.0 - maskb) * v

            def dot(a, c):
                return lax.psum(jnp.sum(ownerw * a * c), axis)

            b = b_loc * maskb
            bnorm = jnp.sqrt(dot(b, b))
            x = jnp.zeros_like(b)
            r = b
            p = r
            rz = dot(r, r)

            def cond(st):
                x, r, p, rz, it = st
                return (jnp.sqrt(rz) > rtol * bnorm) & (it < maxit)

            def body(st):
                x, r, p, rz, it = st
                Ap = matvec(p)
                alpha = rz / (dot(p, Ap) + 1e-300)
                x = x + alpha * p
                r = r - alpha * Ap
                rz_new = dot(r, r)
                p = r + (rz_new / (rz + 1e-300)) * p
                return x, r, p, rz_new, it + 1

            x, r, p, rz, it = lax.while_loop(
                cond, body, (x, r, p, rz, jnp.asarray(0)))
            return x[None], it[None]

        spec = P(axis)
        fn = shard_map(
            kernel, mesh=mesh,
            in_specs=(spec,) * 8,
            out_specs=(spec, spec))

        def solve(b_global):
            bb = self.scatter_state(b_global)
            xb, its = fn(bb, Tb, maskb, ownerw, self.lcd, self.dead,
                         self.lidx, self.sslot)
            return self.gather_state(xb), int(jnp.max(its))

        return solve

    def make_residual(self, mesh: Mesh, params):
        """shard_map'd global velocity-block residual: block assembly +
        ONE interface psum."""
        from jax import shard_map

        axis = self.mesh_axis
        ns, L, d = self.ns, self.L, self.d

        def block_fn(ub, wb, jinv, detj, vol, lcd, dead, lidx, sslot):
            # leading block axis of size 1 inside shard_map
            r = self.local_velocity_residual(
                ub[0], wb[0], jinv[0], detj[0], vol[0], lcd[0], dead[0],
                params)
            # interface exchange: pack, all-reduce, unpack
            buf = jnp.zeros((ns + 1, d), dtype=r.dtype)
            buf = buf.at[sslot[0]].add(r[lidx[0]])
            buf = jax.lax.psum(buf, axis)
            r = r.at[lidx[0]].set(buf[sslot[0]])
            return r[None]

        sh = NamedSharding(mesh, P(axis))
        spec = P(axis)
        fn = shard_map(
            block_fn, mesh=mesh,
            in_specs=(spec,) * 9,
            out_specs=spec)
        return fn
