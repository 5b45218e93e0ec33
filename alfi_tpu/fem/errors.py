"""Error norms against manufactured solutions.

Replaces the errornorm computations of the reference's MMS harness
(/root/reference/examples/mms.py:57-67): |u-u_h|_0, |grad(u-u_h)|_0,
|p-p_h|_0 (both mean-corrected) and |div u_h|_0, all via elevated-degree
quadrature; exact gradients come from autodiff."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import real_dtype
from .nsforms import Tabulation


class ErrorComputer:
    def __init__(self, form, degree_bump=3):
        self.form = form
        d = form.dim
        deg = form.quad_degree + degree_bump
        self.tab_v = Tabulation(form.V.element, d, deg)
        self.tab_q = Tabulation(form.Q.element, d, deg)
        self.xq = form.geom.quad_points_physical(self.tab_v.ref_pts)
        g = form.geom
        self.wdet = self.tab_v.w[None, :] * g.detj[:, None]
        self.jinv = g.jinv
        self.area = g.vol.sum()

    def velocity_errors(self, u, u_exact):
        """(L2 error, H1-seminorm error) vs the exact field (callable on
        one point)."""
        form = self.form
        tv = self.tab_v
        u_loc = u[jnp.asarray(form.V.cell_dofs)]
        uh = jnp.einsum("ql,cld->cqd", tv.phi, u_loc)
        guh = jnp.einsum("qle,cej,cli->cqij", tv.gphi, self.jinv, u_loc)
        ue = jax.vmap(jax.vmap(u_exact))(self.xq)
        gue = jax.vmap(jax.vmap(jax.jacfwd(u_exact)))(self.xq)
        de = uh - ue
        dg = guh - gue
        l2 = jnp.sqrt(jnp.einsum("cq,cqd,cqd->", self.wdet, de, de))
        h1 = jnp.sqrt(jnp.einsum("cq,cqij,cqij->", self.wdet, dg, dg))
        return l2, h1

    def pressure_error(self, p, p_exact):
        """L2 error with both fields mean-corrected (the exact Shih-Tan-
        Hwang pressure is only defined up to a constant here)."""
        form = self.form
        tq = self.tab_q
        ph = jnp.einsum("ql,cl->cq", tq.phi, p[jnp.asarray(form.Q.cell_dofs)])
        pe = jax.vmap(jax.vmap(p_exact))(self.xq)
        ph = ph - jnp.einsum("cq,cq->", self.wdet, ph) / self.area
        pe = pe - jnp.einsum("cq,cq->", self.wdet, pe) / self.area
        d = ph - pe
        return jnp.sqrt(jnp.einsum("cq,cq,cq->", self.wdet, d, d))

    def divergence_norm(self, u):
        form = self.form
        tv = self.tab_v
        gu = jnp.einsum(
            "qle,cej,cli->cqij", tv.gphi, self.jinv,
            u[jnp.asarray(form.V.cell_dofs)]
        )
        divu = jnp.einsum("cqii->cq", gu)
        return jnp.sqrt(jnp.einsum("cq,cq,cq->", self.wdet, divu, divu))
