"""Flux-corrected prolongation for [P1+FacetBubble]^3.

Re-design of /root/reference/alfi/bubble.py: the standard nodal
prolongation of a coarse facet bubble underestimates the flux through the
coarse facet by exactly 0.625 (bubble.py:4-6), so MG loses the
divergence-preservation the AL solver depends on.  Fix: split the nodal
P1FB field into its hierarchical P1 (+) FB parts, scale the NORMAL
component of every coarse bubble by 1/0.625, prolong the parts separately
(P1 by vertex interpolation, FB by point evaluation at fine facet
centroids), recombine.

The reference does the basis change with four embedded C kernels
(bubble.py:57-174) + multiplicity counters; in our dof layout
([vertex dofs | facet dofs], spaces.py) the change of basis is exact
dof-level algebra:

    split:    p1 = f[verts],  fb_F = f[F] - mean_{v in F} f[v]
    combine:  f[verts] = p1,  f[F] = fb_F + mean_{v in F} p1[v]

and the facet-normal "mass solve" (bubble.py:26-39) collapses to
v -> v + (1/0.625 - 1)(v.n)n per facet because facet bubbles vanish on
every other facet (the matrix is diagonal and cancels with the rhs
weights).  restrict() is the exact adjoint chain."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..fem import FunctionSpace, facet_bubble, lagrange
from .transfer import prolongation

FLUX_FACTOR = 1.0 / 0.625 - 1.0


def _facet_normals(mesh):
    V = mesh.vertices[mesh.facet_vertices]  # (nf, 3, 3)
    n = np.cross(V[:, 1] - V[:, 0], V[:, 2] - V[:, 0])
    return n / np.linalg.norm(n, axis=1, keepdims=True)


class BubbleTransfer:
    """apply/apply_transpose with the PointEvalTransfer interface, for
    the VECTOR P1FB space between bary-free hierarchy levels l, l+1."""

    def __init__(self, hierarchy, l):
        meshc, meshf = hierarchy[l], hierarchy[l + 1]
        assert meshc.dim == 3, "bubble flux fix is specific to 3D"
        P1c = FunctionSpace(meshc, lagrange(3, 1))
        P1f = FunctionSpace(meshf, lagrange(3, 1))
        FBc = FunctionSpace(meshc, facet_bubble(3))
        FBf = FunctionSpace(meshf, facet_bubble(3))
        self.p1 = prolongation(hierarchy, l, P1c, P1f)
        self.fb = prolongation(hierarchy, l, FBc, FBf)
        self.nvc, self.nvf = meshc.num_vertices, meshf.num_vertices
        self.fvc = jnp.asarray(meshc.facet_vertices)  # (nfc, 3)
        self.fvf = jnp.asarray(meshf.facet_vertices)
        self.nc_ = jnp.asarray(_facet_normals(meshc), dtype=real_dtype)

    # -- hierarchical basis algebra -----------------------------------
    def _split(self, f):
        p1 = f[: self.nvc]
        fb = f[self.nvc:] - jnp.mean(p1[self.fvc], axis=1)
        return p1, fb

    def _combine_f(self, p1f, fbf):
        facet = fbf + jnp.mean(p1f[self.fvf], axis=1)
        return jnp.concatenate([p1f, facet], axis=0)

    def _scale(self, fb):
        vn = jnp.einsum("fd,fd->f", fb, self.nc_)
        return fb + FLUX_FACTOR * vn[:, None] * self.nc_

    # -- forward -------------------------------------------------------
    def apply(self, uc):
        p1, fb = self._split(uc)
        fb = self._scale(fb)
        return self._combine_f(self.p1.apply(p1), self.fb.apply(fb))

    # -- flattened matrix-weighted gather table ------------------------
    def as_table(self):
        """Flatten the composed transfer (split -> scale -> prolong ->
        combine) into ONE matrix-weighted gather table,

            uf[i] = sum_n W[i, n] @ uc[idx[i, n]],

        the form the distributed solver's ``split_transfer`` block
        localisation understands (scalar-weight nodal transfers are the
        W = w*I special case).  Component mixing appears only through
        the per-coarse-facet flux fix ``I + FLUX*n n^T``, so W is a
        dense 3x3 block per (fine dof, coarse dof) pair.

        Returns ``(idx (nf, ns) int64, W (nf, ns, 3, 3) float64)``;
        pad entries repeat the row's first real source dof with zero W
        (so block localisation resolves them wherever the row itself
        resolves).
        """
        import scipy.sparse as sp

        d = 3
        nvc, nvf = self.nvc, self.nvf
        fvc, fvf = np.asarray(self.fvc), np.asarray(self.fvf)
        nfc, nff = fvc.shape[0], fvf.shape[0]
        nc, nf = nvc + nfc, nvf + nff

        def pet_mat(tr, nrow, ncol):
            idx = np.asarray(tr.idx, np.int64)
            w = np.asarray(tr.w, np.float64)
            rows = np.repeat(np.arange(nrow), idx.shape[1])
            m = sp.coo_matrix((w.ravel(), (rows, idx.ravel())),
                              shape=(nrow, ncol)).tocsr()
            m.eliminate_zeros()
            return m

        P1 = pet_mat(self.p1, nvf, nvc)   # fine P1  <- coarse P1
        FB = pet_mat(self.fb, nff, nfc)   # fine FB  <- coarse FB
        I3 = sp.identity(d, format="csr")

        # split: hierarchical parts of the coarse nodal field
        S_p1 = sp.hstack([sp.identity(nvc),
                          sp.csr_matrix((nvc, nfc))]).tocsr()
        r3 = np.repeat(np.arange(nfc), 3)
        S_fb = (sp.hstack([sp.csr_matrix((nfc, nvc)), sp.identity(nfc)])
                + sp.coo_matrix(
                    (np.full(3 * nfc, -1.0 / 3.0), (r3, fvc.ravel())),
                    shape=(nfc, nc))).tocsr()

        # scale: per-coarse-facet I + FLUX*n n^T (the 0.625 flux fix)
        nrm = np.asarray(self.nc_, np.float64)
        blocks = (np.eye(d)[None]
                  + FLUX_FACTOR * nrm[:, :, None] * nrm[:, None, :])
        Sc = sp.bsr_matrix(
            (blocks, np.arange(nfc), np.arange(nfc + 1)),
            shape=(nfc * d, nfc * d)).tocsr()

        # combine: fine nodal field from hierarchical fine parts
        C_v = sp.hstack([sp.identity(nvf), sp.csr_matrix((nvf, nff))])
        r3f = np.repeat(np.arange(nff), 3)
        C_f = sp.hstack([
            sp.coo_matrix((np.full(3 * nff, 1.0 / 3.0),
                           (r3f, fvf.ravel())), shape=(nff, nvf)),
            sp.identity(nff)])
        C = sp.vstack([C_v, C_f]).tocsr()

        # dof-major flattening (dof*d + component): kron(A, I3)
        M = (sp.kron(C, I3)
             @ sp.block_diag([sp.kron(P1, I3),
                              sp.kron(FB, I3) @ Sc])
             @ sp.kron(sp.vstack([S_p1, S_fb]), I3)).tocsr()
        M.eliminate_zeros()

        B = sp.bsr_matrix(M, blocksize=(d, d))
        counts = np.diff(B.indptr)
        ns = int(max(1, counts.max()))
        first = np.zeros(nf, dtype=np.int64)
        nz = counts > 0
        first[nz] = B.indices[B.indptr[:-1][nz]]
        idx = np.repeat(first[:, None], ns, axis=1)
        W = np.zeros((nf, ns, d, d))
        pos = np.arange(len(B.indices)) - np.repeat(B.indptr[:-1], counts)
        rowid = np.repeat(np.arange(nf), counts)
        idx[rowid, pos] = B.indices
        W[rowid, pos] = B.data
        return idx, W

    # -- exact adjoint ---------------------------------------------------
    def apply_transpose(self, rf):
        # combine^T
        p1f = rf[: self.nvf]
        facet = rf[self.nvf:]
        p1f = p1f.at[self.fvf].add(facet[:, None, :] / 3.0)
        fbf = facet
        # prolong^T
        p1c = self.p1.apply_transpose(p1f)
        fbc = self.fb.apply_transpose(fbf)
        # scale^T (= scale) then split^T
        fbc = self._scale(fbc)
        out_v = p1c.at[self.fvc].add(-fbc[:, None, :] / 3.0)
        return jnp.concatenate([out_v, fbc], axis=0)
