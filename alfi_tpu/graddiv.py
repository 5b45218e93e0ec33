"""Grad-div velocity-block study harness.

Re-design of /root/reference/examples/graddiv/graddiv.py: isolates the
velocity-block multigrid on

    F(u) = 2 nu (sym grad u, grad v) + gamma (div u, div v) - (f, v),
    u = 0 on the whole boundary,  f = (1, ..., 1)

and sweeps gamma in {0, 1, 10, ..., 1e8} comparing smoother (patch vs
jacobi) x transfer (Schoeberl on/off).  Expected (the papers' Fig./Table):
patch + transfer iterations stay FLAT in gamma; everything else blows up.

Solved with CG (rtol 1e-8, max 200, unpreconditioned norm) preconditioned
by a W-cycle GMG with Chebyshev(2)-driven smoothers — Chebyshev keeps the
preconditioner LINEAR so CG stays valid, exactly like the reference's
options (graddiv.py:88-147)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import real_dtype
from .fem import (
    FunctionSpace,
    MixedFunctionSpace,
    NSForm,
    VectorFunctionSpace,
    dg_lagrange,
    lagrange,
    pk_facet_bubble,
)
from .fem.bcs import BCSet, DirichletBC
from .mesh import mesh_hierarchy, rectangle_mesh, unit_cube_mesh
from .mg.velocity import VelocityMG
from .problem import NavierStokesProblem
from .solvers.krylov import cg


class _ZeroBCProblem(NavierStokesProblem):
    def __init__(self, base):
        self._base = base

    def mesh(self):
        return self._base

    def bcs(self, Z):
        d = Z.mesh.dim
        return [DirichletBC(Z.V, (0.0,) * d, None)]

    def has_nullspace(self):
        return False


class GradDivSolver:
    def __init__(self, dim=2, baseN=8, nref=1, k=2, discretisation="pkp0",
                 hierarchy="uniform", patch="star", smoother="patch",
                 transfer=True, smoothing=2, diagonal="left", mesh=None):
        # smoothing 2 matches the reference's chebyshev max_it 2
        # (/root/reference/examples/graddiv/graddiv.py:99-111); the
        # Arnoldi sigma_max eigenvalue estimate (mg/velocity.py
        # _estimate_lmax) is tight enough for the same gamma-robustness
        # (the earlier power-iteration estimate needed a 3rd step)
        if mesh is None:
            if dim == 2:
                mesh = rectangle_mesh(baseN, baseN, 1, 1, diagonal=diagonal)
            else:
                mesh = unit_cube_mesh(baseN)
        self.problem = _ZeroBCProblem(mesh)
        self.mh = self.problem.mesh_hierarchy(hierarchy, nref)
        self.patch = patch
        self.smoothing = smoothing
        # the graddiv harness uses the Schoeberl ADJOINT restriction so
        # the GMG preconditioner is symmetric — required for the CG outer
        # (/root/reference/examples/graddiv/graddiv.py:158 wires
        # vtransfer.restrict, unlike the NS solver's default)
        self.restriction = True
        fine = self.mh[-1]
        d = fine.dim
        self.d = d
        if discretisation == "pkp0" and k < d:
            eu = pk_facet_bubble(d, k)
        else:
            eu = lagrange(d, k)
        V = VectorFunctionSpace(fine, eu)
        Q = FunctionSpace(fine, dg_lagrange(d, 0))
        self.Z = MixedFunctionSpace(V, Q)
        gd_mode = "cell_avg" if discretisation == "pkp0" else "exact"
        self.form = NSForm(V, Q, graddiv_mode=gd_mode)
        self.bcset = BCSet(self.Z, self.problem.bcs(self.Z))
        self.smoother = smoother
        if smoother == "amg":
            # the reference's algebraic baseline
            # (/root/reference/examples/graddiv/graddiv.py:140-147
            # smoother "amg" -> hypre boomeramg): smoothed-aggregation
            # AMG on the gamma-grad-div operator, rebuilt per gamma in
            # solve() because the SA prolongators smooth on the static
            # K + gamma*G part.  Expected (and the papers' point):
            # iterations blow up as gamma grows.
            self.vmg = None
        else:
            self.vmg = VelocityMG(
                self, transfer_mode="schoeberl" if transfer
                else "standard",
                smoother=smoother, smoother_driver="chebyshev",
                cycle="w")
        self._load = self._assemble_load()

    def _assemble_load(self):
        """(f, v) with f = (1, ..., 1), BC rows zeroed."""
        form = self.form
        tv = form.tab_v
        wdet = tv.w[None, :] * form.geom.detj[:, None]
        # integral of each test function per cell, all components equal
        loads = jnp.einsum("cq,ql->cl", wdet, tv.phi)
        F = jnp.zeros((form.V.ndof,), dtype=real_dtype)
        F = F.at[jnp.asarray(form.V.cell_dofs)].add(loads)
        b = jnp.broadcast_to(F[:, None], (form.V.ndof, self.d))
        return self.bcset.mask[0] * b

    def solve(self, gamma, rtol=1e-8, maxit=200):
        """Returns (u, iteration count, converged)."""
        params = {
            "nu": jnp.asarray(1.0, dtype=real_dtype),
            "gamma": jnp.asarray(float(gamma), dtype=real_dtype),
            "advect": jnp.asarray(0.0, dtype=real_dtype),
        }
        # the reference uses viscosity coefficient 1 in front of
        # 2 sym grad: our kernel's nu multiplies the same term.
        if self.smoother == "amg":
            from .mg.amg import VelocityAMG

            self.gamma = float(gamma)  # SA smooths on K + gamma*G
            vmg = VelocityAMG(self, smoothing=self.smoothing)
            amg = True
        else:
            vmg = self.vmg
            amg = False
        mask_u = self.bcset.mask[0]
        zero_wind = jnp.zeros((self.form.V.ndof, self.d),
                              dtype=real_dtype)

        @jax.jit
        def run(params, b):
            state = vmg.setup(zero_wind, params)
            solve_A = vmg.make_solve_A(state)

            if amg:
                def A(v):
                    return vmg.level_apply(state["tensors"], None, v)
            else:
                def A(v):
                    return vmg.level_apply(vmg.nlevels - 1,
                                           state["tensors"][-1], v)

            return cg(A, b, pc=solve_A, rtol=rtol, maxit=maxit)

        u, info = run(params, self._load)
        return u, int(info["iters"]), bool(info["converged"])


def gamma_sweep(gammas=(0.0, 1.0, 1e1, 1e2, 1e3, 1e4, 1e6, 1e8), **kw):
    """The reference's experiment loop (graddiv.py:160-180): returns
    {gamma: iterations} with 201 marking divergence (">200")."""
    s = GradDivSolver(**kw)
    out = {}
    for g in gammas:
        try:
            _, its, conv = s.solve(g)
            out[g] = its if conv else 201
        except FloatingPointError:
            out[g] = 201
    return out
