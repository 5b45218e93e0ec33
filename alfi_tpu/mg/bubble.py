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
