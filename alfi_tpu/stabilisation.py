"""Advection stabilisation: SUPG / GLS (Pk-P0) and Burman edge
stabilisation (Scott-Vogelius).

Re-design of /root/reference/alfi/stabilisation.py + its wiring in
/root/reference/alfi/solver.py:202-237.  Semantics preserved exactly:

* the stabilisation COEFFICIENT beta, the strong residual Lu AND the
  SUPG test direction (grad v) w use the LIVE state u (the reference
  constructs SUPG with state=u, so self.wind IS u -> differentiable,
  enters the Newton Jacobian via jvp),
* only GLS's Lv advection uses the FROZEN wind = velocity of the
  previous Reynolds solution (z_last, /root/reference/alfi/solver.py:205,216),
  passed in through params["wind"],
* the whole term is multiplied by ``advect`` (vanishes for Stokes),
* Shakib-Hughes-Zohan coefficient
  beta = ((4 |u|^2 / h^2) + magic (4 nu / h^2)^2)^{-1/2}, default weight
  1.0 (2D) / 0.1 (3D), magic 9.0 at the solver level,
* Burman: 0.5 * w * h_F^2 * avg|u| * (jump(grad u . n), jump(grad v . n))
  over interior facets, default weight 3e-3.

The residual hook returns a FULL (Rv, Rq) contribution (GLS touches
pressure rows through grad q).
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import real_dtype
from .fem.facets import InteriorFacets
from .fem.nsforms import Tabulation


class ShakibSUPG:
    """SUPG / GLS with the Shakib-Hughes-Zohan coefficient
    (/root/reference/alfi/stabilisation.py:73-97)."""

    def __init__(self, form, mode, magic=9.0, weight=None):
        self.form = form
        self.mode = mode  # 'supg' | 'gls'
        self.magic = magic
        d = form.dim
        self.weight = weight if weight is not None else (
            0.1 if d == 3 else 1.0)
        tv, tq = form.tab_v, form.tab_q
        # physical hessians of the velocity basis per cell:
        # H_phys[l, a, b] = Jinv^T H_ref Jinv  (affine cells)
        href = jnp.asarray(
            form.V.element.tabulate_hess(tv.ref_pts), dtype=real_dtype)
        jinv = form.geom.jinv
        self.hess = jnp.einsum(
            "qlde,cda,ceb->cqlab", href, jinv, jinv)
        gq_ref = tq.gphi  # (nq, nlq, d)
        self.gq = jnp.einsum("qle,cej->cqlj", gq_ref, jinv)
        self.h = form.geom.h  # CellSize

    def _strong_terms(self, z, params):
        """u, grad u, Lu at quadrature points (live state)."""
        form = self.form
        u, p = z
        tv = form.tab_v
        nu, advect = params["nu"], params["advect"]
        u_loc = u[jnp.asarray(form.V.cell_dofs)]
        p_loc = p[jnp.asarray(form.Q.cell_dofs)]
        jinv = form.geom.jinv
        u_q = jnp.einsum("ql,cld->cqd", tv.phi, u_loc)
        gu = jnp.einsum("qle,cej,cli->cqij", tv.gphi, jinv, u_loc)
        Hu = jnp.einsum("cqlab,cli->cqiab", self.hess, u_loc)
        # div(2 sym grad u)_i = lap u_i + d_i div u
        visc = jnp.einsum("cqiaa->cqi", Hu) + jnp.einsum("cqaia->cqi", Hu)
        gp = jnp.einsum("cqlj,cl->cqj", self.gq, p_loc)
        Lu = -nu * visc + advect * jnp.einsum(
            "cqij,cqj->cqi", gu, u_q) + gp
        if form.rhs is not None:
            xq = form.geom.quad_points_physical(tv.ref_pts)
            f_v, _ = form.rhs(xq.reshape(-1, form.dim), params)
            Lu = Lu - f_v.reshape(Lu.shape)
        return u_q, gu, Lu

    def _beta(self, u_q, params):
        nu = params["nu"]
        h2 = (self.h ** 2)[:, None]
        w2 = jnp.einsum("cqd,cqd->cq", u_q, u_q)
        return (4.0 * w2 / h2
                + self.magic * (4.0 * nu / h2) ** 2) ** (-0.5)

    def residual(self, z, params):
        form = self.form
        tv = form.tab_v
        u_q, gu, Lu = self._strong_terms(z, params)
        beta = self._beta(u_q, params)
        wdet = tv.w[None, :] * form.geom.detj[:, None]
        coef = self.weight * wdet * beta  # (nc, nq)
        jinv = form.geom.jinv
        gtest = jnp.einsum("qle,cej->cqlj", tv.gphi, jinv)
        # SUPG test direction (grad v) w uses the LIVE state (the
        # reference's SUPG.form has w = self.wind = u, state=u at
        # /root/reference/alfi/solver.py:208-211)
        adv_test = jnp.einsum("cqlj,cqj->cql", gtest, u_q)
        rv_loc = jnp.einsum("cq,cqi,cql->cli", coef, Lu, adv_test)
        rq_loc = None
        if self.mode == "gls":
            # GLS's Lv advects the test function with the FROZEN wind
            # (z_last, /root/reference/alfi/solver.py:205,216)
            wind = params["wind"]
            w_loc = wind[jnp.asarray(form.V.cell_dofs)]
            w_q = jnp.einsum("ql,cld->cqd", tv.phi, w_loc)
            adv_test = jnp.einsum("cqlj,cqj->cql", gtest, w_q)
            # Lv for v = phi_l e_i:
            #   (div 2 sym grad v)_j = delta_ij lap phi_l + d_i d_j phi_l
            #   ((grad v) w)_j       = delta_ij (grad phi_l . w)
            # so inner(Lu, Lv) for test (l, i) =
            #   Lu_i (-nu lap phi_l + grad phi_l . w)
            #   + sum_j Lu_j (-nu H[l, i, j])
            nu = params["nu"]
            Hl = self.hess  # (nc, nq, nloc, d, d)
            lap = jnp.einsum("cqlaa->cql", Hl)
            rv_loc = jnp.einsum("cq,cqi,cql->cli", coef, Lu,
                                -nu * lap + adv_test) \
                + jnp.einsum("cq,cqj,cqlij->cli", coef, Lu, -nu * Hl)
            # pressure rows: inner(Lu, grad q)
            rq_loc = jnp.einsum("cq,cqj,cqlj->cl", coef, Lu, self.gq)
        if form._sum_v is not None:
            Rv = form._sum_v(rv_loc)
            Rq = (form._sum_q(rq_loc) if rq_loc is not None
                  else jnp.zeros((form.Q.ndof,), dtype=Rv.dtype))
        else:
            Rv = jnp.zeros((form.V.ndof, form.dim), dtype=rv_loc.dtype)
            Rv = Rv.at[jnp.asarray(form.V.cell_dofs)].add(rv_loc)
            Rq = jnp.zeros((form.Q.ndof,), dtype=Rv.dtype)
            if rq_loc is not None:
                Rq = Rq.at[jnp.asarray(form.Q.cell_dofs)].add(rq_loc)
        return Rv, Rq


class TurekSUPG(ShakibSUPG):
    """Turek's SUPG coefficient (/root/reference/alfi/stabilisation.py:100-136):
    Re_tau = cell_avg(|u|) h Re;  beta = magic h 2 Re_tau / (w_avg (1+Re_tau))
    with w_avg = (1/|Omega|) \\int |wind| dx (the FROZEN wind, updated per
    solve in the reference's update())."""

    def __init__(self, form, mode, char_LU=1.0, magic=1.0, weight=None):
        super().__init__(form, mode, magic=magic, weight=weight)
        self.char_LU = char_LU
        tv = form.tab_v
        self._wdet = tv.w[None, :] * form.geom.detj[:, None]
        self._domain_measure = float(form.area())

    def _beta(self, u_q, params):
        form = self.form
        nu = params["nu"]
        Re = self.char_LU / nu
        wind = params["wind"]
        w_loc = wind[jnp.asarray(form.V.cell_dofs)]
        w_qq = jnp.einsum("ql,cld->cqd", form.tab_v.phi, w_loc)
        w_avg = jnp.einsum(
            "cq,cq->", self._wdet,
            jnp.sqrt(jnp.einsum("cqd,cqd->cq", w_qq, w_qq))
        ) / self._domain_measure
        # cell average of |u| (live state)
        unorm = jnp.sqrt(jnp.einsum("cqd,cqd->cq", u_q, u_q))
        cellavg = (jnp.einsum("cq,cq->c", self._wdet, unorm)
                   / (self._wdet.sum(axis=1)))
        h = self.h
        re_tau = cellavg * h * Re
        beta = self.magic * h * 2.0 * re_tau / (w_avg * (1.0 + re_tau)
                                                + 1e-300)
        return beta[:, None] * jnp.ones_like(unorm)


class BurmanStabilisation:
    """Interior-penalty jump stabilisation
    (/root/reference/alfi/stabilisation.py:139-162)."""

    def __init__(self, form, weight=None):
        self.form = form
        self.weight = weight if weight is not None else 3e-3
        deg = 2 * form.V.element.degree
        self.facets = InteriorFacets(form.V, deg)
        from .utils.scatter import default_use_tables, make_gather_sum

        if default_use_tables():
            mesh = form.V.mesh
            fc = mesh.facet_cells[mesh.interior_facets]
            self._sum0 = make_gather_sum(form.V.cell_dofs[fc[:, 0]],
                                         form.V.ndof)
            self._sum1 = make_gather_sum(form.V.cell_dofs[fc[:, 1]],
                                         form.V.ndof)
        else:
            self._sum0 = self._sum1 = None

    def residual(self, z, params):
        form = self.form
        fa = self.facets
        u = z[0]
        cd = jnp.asarray(form.V.cell_dofs)
        jinv = form.geom.jinv
        u0, g0, dofs0 = fa.side_values(cd, jinv, u, 0)
        u1, g1, dofs1 = fa.side_values(cd, jinv, u, 1)
        gu0 = jnp.einsum("fqlj,fld->fqdj", g0, u[dofs0])
        gu1 = jnp.einsum("fqlj,fld->fqdj", g1, u[dofs1])
        n = fa.normal
        jump = jnp.einsum("fqdj,fj->fqd", gu0 - gu1, n)
        # beta = facet average of sqrt(|u|^2 + 1e-10) (sides agree for CG;
        # average anyway like avg() does)
        wsum = fa.w.sum()
        sp0 = jnp.sqrt(jnp.einsum("fqd,fqd->fq", u0, u0) + 1e-10)
        sp1 = jnp.sqrt(jnp.einsum("fqd,fqd->fq", u1, u1) + 1e-10)
        beta = 0.5 * (jnp.einsum("q,fq->f", fa.w, sp0)
                      + jnp.einsum("q,fq->f", fa.w, sp1)) / wsum
        coef = (0.5 * self.weight * fa.harea ** 2 * beta
                * fa.scale)  # (nif,)
        wq = fa.w
        tn0 = jnp.einsum("fqlj,fj->fql", g0, n)
        tn1 = jnp.einsum("fqlj,fj->fql", g1, n)
        r0 = jnp.einsum("f,q,fqd,fql->fld", coef, wq, jump, tn0)
        r1 = -jnp.einsum("f,q,fqd,fql->fld", coef, wq, jump, tn1)
        if self._sum0 is not None:
            Rv = self._sum0(r0) + self._sum1(r1)
        else:
            Rv = jnp.zeros((form.V.ndof, form.dim), dtype=u.dtype)
            Rv = Rv.at[dofs0].add(r0).at[dofs1].add(r1)
        Rq = jnp.zeros((form.Q.ndof,), dtype=u.dtype)
        return Rv, Rq


class StabilisationWrapper:
    """Adapts a stabilisation to the NSForm hook + solver lifecycle."""

    def __init__(self, impl, bcset):
        self.impl = impl
        self.bcset = bcset

    def residual_hook(self, z, params):
        advect = params["advect"]
        Rv, Rq = self.impl.residual(z, params)
        return advect * Rv, advect * Rq

    def update(self, wind):
        # wind travels through params["wind"]; nothing cached here
        pass


def make_stabilisation(form, kind, supg_method, supg_magic, weight, bcset,
                       char_LU=1.0):
    if kind in ("supg", "gls"):
        if supg_method == "shakib":
            impl = ShakibSUPG(form, kind, magic=supg_magic, weight=weight)
        elif supg_method == "turek":
            impl = TurekSUPG(form, kind, char_LU=char_LU,
                             magic=supg_magic, weight=weight)
        else:
            raise NotImplementedError(f"supg_method {supg_method!r}")
    elif kind == "burman":
        impl = BurmanStabilisation(form, weight=weight)
    else:
        raise ValueError(kind)
    return StabilisationWrapper(impl, bcset)
