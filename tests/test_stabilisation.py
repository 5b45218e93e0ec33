"""Stabilisation tests: SUPG/GLS (Pk-P0) and Burman (SV), mirroring the
reference's usage (/root/reference/alfi/solver.py:202-237; Burman default
for SV production runs, /root/reference/examples/generate_submission:85)."""

import jax.numpy as jnp
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.utils.tree import tnorm


@pytest.mark.parametrize("stab", ["supg", "gls"])
def test_supg_gls_pkp0_converges(stab):
    problem = TwoDimLidDrivenCavityProblem(4)
    s = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
        gamma=1e4, stabilisation_type=stab, verbose=False)
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], (stab, re)
    # stabilised solution stays near the unstabilised one at modest Re
    s0 = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="allu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    s0.solve(1)
    z0, _ = s0.solve(100)
    du = float(jnp.max(jnp.abs(z[0] - z0[0])))
    assert du < 0.05


def test_stab_vanishes_for_stokes():
    """advect=0 must kill the stabilisation term exactly."""
    problem = TwoDimLidDrivenCavityProblem(4)
    s = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, stabilisation_type="supg", verbose=False)
    s0 = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="lu", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z, _ = s.solve(0)
    z0, _ = s0.solve(0)
    assert float(jnp.max(jnp.abs(z[0] - z0[0]))) < 1e-10


def test_burman_sv():
    problem = TwoDimLidDrivenCavityProblem(3)
    s = ScottVogeliusSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="bary",
        patch="macro", gamma=1e4, stabilisation_type="burman",
        verbose=False)
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], re
    # Burman is consistent on the continuous level; the discrete solution
    # should stay divergence-free (the stab term only touches velocity)
    from alfi_tpu.fem.errors import ErrorComputer

    ec = ErrorComputer(s.form)
    assert float(ec.divergence_norm(z[0])) < 1e-7


def test_supg_velocity_tensors_match_jvp():
    """The per-cell SUPG/GLS Jacobians used by the MG operators must act
    like the true d(stab Rv)/du at fixed p (the reference assembles its
    PCMG/PCPatch operators from the same stabilised Jacobian)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    for method, kind in [("shakib", "supg"), ("shakib", "gls"),
                         ("turek", "supg")]:
        s = ConstantPressureSolver(
            TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
            solver_type="almg", hierarchy="uniform",
            stabilisation_type=kind, supg_method=method, verbose=False)
        s.advect_val, s.nu_val = 1.0, 0.05
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(s.z[0].shape))
        p = jnp.asarray(rng.standard_normal(s.z[1].shape))
        du = jnp.asarray(rng.standard_normal(u.shape))
        params = s.params()
        impl = s.stabilisation.impl
        T = impl.velocity_element_tensors((u, p), params)  # (nc, nld, nld)
        # assemble the action of T on du
        form = s.form
        cd = np.asarray(form.V.cell_dofs)
        d = form.dim
        du_loc = du[cd].reshape(cd.shape[0], -1)
        act_loc = jnp.einsum("cij,cj->ci", T, du_loc)
        act = np.zeros(u.shape)
        np.add.at(act, cd, np.asarray(act_loc).reshape(
            cd.shape[0], -1, d))
        # reference: jvp of the assembled stab velocity residual
        _, jv = jax.jvp(
            lambda uu: impl.residual((uu, p), params)[0], (u,), (du,))
        scale = float(jnp.max(jnp.abs(jv))) + 1e-30
        err = float(jnp.max(jnp.abs(act - jv))) / scale
        assert err < 1e-9, (method, kind, err)


def test_supg_analytic_jacobian_chunked_matches_unchunked():
    """The cell-chunked analytic SUPG Jacobian (the memory-bounded path
    the 3D production meshes take) must agree with the single-chunk
    evaluation exactly, including the padded tail chunk."""
    import jax.numpy as jnp
    import numpy as np

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="almg", hierarchy="uniform",
        stabilisation_type="supg", verbose=False)
    s.advect_val, s.nu_val = 1.0, 0.05
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(s.z[0].shape))
    p = jnp.asarray(rng.standard_normal(s.z[1].shape))
    params = s.params()
    impl = s.stabilisation.impl
    form = s.form
    ul = u[jnp.asarray(form.V.cell_dofs)]
    pl = p[jnp.asarray(form.Q.cell_dofs)]
    geom = form.geom
    nc = ul.shape[0]
    xq = jnp.zeros((nc, form.tab_v.nq, form.dim), dtype=ul.dtype)
    args = (params, ul, pl, geom.jinv, geom.detj, impl.h, xq, 0.0)
    J_one = impl._vet_supg_analytic(*args, chunk=nc + 1)
    # chunk that does NOT divide nc: exercises the zero-padded tail
    J_chunked = impl._vet_supg_analytic(*args, chunk=48)
    assert np.allclose(np.asarray(J_one), np.asarray(J_chunked),
                       rtol=0, atol=1e-12)
