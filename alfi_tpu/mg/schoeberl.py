"""Schoeberl robust prolongation (the component SURVEY.md §7 ranks as
hard part #2).

Re-design of /root/reference/alfi/transfer.py:91-356 (AutoSchoeberlTransfer
+ SV/PkP0 subclasses): the standard prolongation P is corrected so the
prolonged field stays (nearly) divergence-free inside every coarse cell —
without this the MG velocity solve degrades as gamma grows (that failure
mode is exactly what the graddiv harness exposes).

Algebra (with Z = row mask vanishing on the closure of fine facets that
lie on the coarse skeleton, M = additive patch inverse over coarse-cell
patches of the gamma-weighted velocity form a, and A_gd = the
gamma-grad-div-only operator):

    prolong:  u_f = (I - M Z A_gd) P u_c
    restrict: r_c = P^T (I - A_gd Z M) r_f            (exact adjoint)

Matching the reference:
* the patch operator uses a = nu (2 sym grad u, grad v) + gamma graddiv
  with NO advection (/root/reference/alfi/transfer.py:296-309),
* the rhs form is the gamma graddiv term only (bform, :160-162, 303-309),
* patches: all fine cells inside one coarse cell (uniform) or one macro
  group = coarse uniform cell (bary), minus coarse-skeleton dofs
  (fix_coarse_boundaries, :121-158 — here a static mask precomputed from
  ``facet_birth_level``),
* operators are rebuilt when (nu, gamma) change — here they are simply
  functions of ``params``, rebuilt per Newton step inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from .patches import build_patch_solver, cell_patches


class SchoeberlTransfer:
    """Transfer between hierarchy levels l (coarse) and l+1 (fine) of a
    VelocityMG."""

    def __init__(self, mg, l):
        self.mg = mg
        self.l = l
        hierarchy = mg.hierarchy
        mesh_f = hierarchy[l + 1]
        mesh_c = hierarchy[l]
        lev_f = mg.levels[l + 1]
        V = lev_f.V
        d = mg.d
        self.fine_level = lev_f
        self.standard = mg.prolongs[l]

        # --- coarse-skeleton dof mask (fix_coarse_boundaries analogue):
        # fine facets whose geometric ancestor existed at the coarse level
        # (this includes the whole domain boundary, birth level 0)
        skel = np.where(mesh_f.facet_birth_level <= mesh_c.level)[0]
        fixed = V.facet_closure_dofs(skel)
        zmask = np.ones((V.ndof, d))
        zmask[fixed] = 0.0
        self.zmask = jnp.asarray(zmask, dtype=real_dtype)

        # --- coarse-cell patches
        # NOTE: the transfer's patch solves stay on the direct (f64)
        # factorisation path even when the smoother uses the gamma-split
        # Woodbury solver: the prolongation quality is the component the
        # gamma-robustness is most sensitive to (empirically the f32
        # Woodbury transfer stalls the outer FGMRES at Re>=100 even
        # though its isolated outputs agree to ~0.4%).
        _, groups = self._patch_cell_groups(hierarchy, l)
        ps = cell_patches(V, zmask.reshape(-1), groups)
        self.patchset = ps
        self.factor, self.papply = build_patch_solver(ps)

    @staticmethod
    def _patch_cell_groups(hierarchy, l):
        """(n_patches, cells-per-patch) fine cells of each coarse cell
        (uniform) / macro group (bary)."""
        fine = hierarchy[l + 1]
        d = fine.dim
        if hierarchy.kind == "bary":
            u_fine = hierarchy.uniform_meshes[l + 1]
            u_coarse = hierarchy.uniform_meshes[l]
            nch = u_fine.n_children
            nuc = u_coarse.num_cells
            u = np.arange(nuc, dtype=np.int64)
            fine_u = u[:, None] * nch + np.arange(nch)[None, :]
            groups = (fine_u[:, :, None] * (d + 1)
                      + np.arange(d + 1)[None, None, :]).reshape(nuc, -1)
            return nch * (d + 1), groups
        nch = fine.n_children
        ncc = hierarchy[l].num_cells
        groups = (np.arange(ncc, dtype=np.int64)[:, None] * nch
                  + np.arange(nch)[None, :])
        return nch, groups

    # ------------------------------------------------------------------
    def static_ops(self):
        """One-time patch contraction of the (wind-free) transfer form's
        parts — see mg/patches.py patch_static_operators.  Compute
        OUTSIDE jit; pass the result back through setup(static=...)."""
        from .patches import patch_static_operators

        return patch_static_operators(self.patchset, self.fine_level.form)

    def setup(self, params, static=None):
        """Per-parameter state (pure): patch factorisations of the
        transfer form (nu viscous + gamma graddiv, no advection)."""
        from ..solvers.batched_lu import get_factorization

        if static is not None:
            A = (params["nu"] * static["K"]
                 + params["gamma"] * static["G"])
            ar = jnp.arange(A.shape[-1])
            A = A.at[:, ar, ar].add(static["pad_diag"].astype(A.dtype))
            lufac = get_factorization("patch").factor(A)
        else:
            form = self.fine_level.form
            zero_wind = jnp.zeros((self.fine_level.V.ndof, self.mg.d),
                                  dtype=real_dtype)
            params_a = dict(params)
            params_a["advect"] = jnp.zeros_like(params["advect"])
            tensors_a = form.velocity_element_tensors(params_a, zero_wind)
            lufac = self.factor(tensors_a)
        return {"lufac": lufac, "gamma": params["gamma"]}

    def _apply_gd(self, gamma, v):
        """Raw gamma-grad-div operator via the static low-rank factors
        (no BC handling)."""
        lev = self.fine_level
        # f32 MG cycle (config.mg_dtype): stream the factors in the
        # vector dtype instead of upcasting the whole transfer to f64
        Bt = lev.form.graddiv_factors().astype(v.dtype)  # (nc, nld, q)
        vloc = v.reshape(-1)[lev.rows]
        t = jnp.einsum("clq,cl->cq", Bt, vloc)
        rloc = (gamma.astype(v.dtype)
                * jnp.einsum("clq,cq->cl", Bt, t))
        if lev.row_sum is not None:
            return lev.row_sum(rloc).reshape(lev.V.ndof, self.mg.d)
        r = jnp.zeros((lev.V.ndof * self.mg.d,), dtype=v.dtype)
        return r.at[lev.rows].add(rloc).reshape(lev.V.ndof, self.mg.d)

    def _patch_solve(self, lufac, r):
        x = self.papply(lufac, r.reshape(-1))
        return x.reshape(-1, self.mg.d)

    def prolong(self, state, uc):
        rhs = self.standard.apply(uc)
        b = self.zmask.astype(rhs.dtype) * self._apply_gd(
            state["gamma"], rhs)
        tildeu = self._patch_solve(state["lufac"], b)
        return rhs - tildeu

    def restrict(self, state, rf):
        t = self._patch_solve(state["lufac"],
                              self.zmask.astype(rf.dtype) * rf)
        b = self._apply_gd(state["gamma"], t)
        return self.standard.apply_transpose(rf - b)
