import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alfi_tpu.fem import (
    FunctionSpace,
    NSForm,
    VectorFunctionSpace,
    dg_lagrange,
    lagrange,
    pk_facet_bubble,
)
from alfi_tpu.mesh import unit_cube_mesh, unit_square_mesh
from alfi_tpu.utils.tree import tdot


def make_form(d=2, k=2, mode="cell_avg", kq=0, n=3):
    mesh = unit_square_mesh(n) if d == 2 else unit_cube_mesh(2)
    V = VectorFunctionSpace(mesh, lagrange(d, k))
    Q = FunctionSpace(mesh, dg_lagrange(d, kq))
    return NSForm(V, Q, mode), V, Q


def interp(V, f):
    return jnp.asarray(f(V.dof_coords))


@pytest.mark.parametrize("d", [2, 3])
def test_viscous_energy(d):
    """residual . w == nu * int 2 sym(grad u):grad(w) for linear fields."""
    form, V, Q = make_form(d=d)
    u = interp(V, lambda x: np.stack([x[:, 0], -x[:, 1]] + ([0 * x[:, 0]] if d == 3 else []), axis=1))
    p = jnp.zeros(Q.ndof)
    params = dict(nu=1.0, gamma=0.0, advect=0.0)
    R, _ = form.residual((u, p), params)
    # 2 sym grad u = diag(2,-2[,0]); : grad u -> 2*1 + (-2)*(-1) = 4 per unit vol
    assert np.isclose(float(jnp.vdot(R, u)), 4.0, atol=1e-10)


def test_divergence_and_graddiv():
    form, V, Q = make_form()
    # divergence-free field
    u = interp(V, lambda x: np.stack([x[:, 1], -0 * x[:, 0]], axis=1))
    assert np.isclose(float(form.divergence_norm(u)), 0.0, atol=1e-12)
    params = dict(nu=0.0, gamma=1.0, advect=0.0)
    R, Rq = form.residual((u, jnp.zeros(Q.ndof)), params)
    assert np.allclose(np.asarray(R), 0.0, atol=1e-12)
    assert np.allclose(np.asarray(Rq), 0.0, atol=1e-12)
    # u = (x, y): div u = 2; graddiv residual . u = gamma * int 2*2 = 4
    u2 = interp(V, lambda x: x.copy())
    R2, _ = form.residual((u2, jnp.zeros(Q.ndof)), params)
    assert np.isclose(float(jnp.vdot(R2, u2)), 4.0, atol=1e-10)


def test_cell_avg_equals_exact_for_linear():
    """For P1 velocity, div u is cellwise constant: both modes agree."""
    mesh = unit_square_mesh(3)
    V = VectorFunctionSpace(mesh, lagrange(2, 1))
    Q = FunctionSpace(mesh, dg_lagrange(2, 0))
    fa = NSForm(V, Q, "cell_avg")
    fe = NSForm(V, Q, "exact")
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(V.ndof, 2))
    p = jnp.asarray(rng.randn(Q.ndof))
    params = dict(nu=0.7, gamma=3.0, advect=1.0)
    Ra = fa.residual((u, p), params)
    Re = fe.residual((u, p), params)
    assert np.allclose(np.asarray(Ra[0]), np.asarray(Re[0]), atol=1e-9)
    assert np.allclose(np.asarray(Ra[1]), np.asarray(Re[1]), atol=1e-9)


def test_advection_value():
    form, V, Q = make_form()
    # u = (y, x): (grad u) u = (x, y); int (x,y).(y,x) = 2 int xy = 1/2
    u = interp(V, lambda x: x[:, ::-1].copy())
    params = dict(nu=0.0, gamma=0.0, advect=1.0)
    R, _ = form.residual((u, jnp.zeros(Q.ndof)), params)
    assert np.isclose(float(jnp.vdot(R, u)), 0.5, atol=1e-10)


def test_pressure_coupling_adjoint():
    """(1,0) and (0,1) Jacobian blocks are negative adjoints:
    (B u, p) == (u, B^T p) with J_pu = -div, J_up = -grad^T."""
    form, V, Q = make_form(kq=1)
    rng = np.random.RandomState(1)
    z = (jnp.asarray(rng.randn(V.ndof, 2)), jnp.asarray(rng.randn(Q.ndof)))
    params = dict(nu=0.3, gamma=2.0, advect=1.0)

    du = jnp.asarray(rng.randn(V.ndof, 2))
    dp = jnp.asarray(rng.randn(Q.ndof))
    f = lambda zz: form.residual(zz, params)
    _, J_u = jax.jvp(f, (z,), ((du, jnp.zeros_like(z[1])),))
    _, J_p = jax.jvp(f, (z,), ((jnp.zeros_like(z[0]), dp),))
    # B du = J_u[1]; B^T dp = J_p[0]
    assert np.isclose(
        float(jnp.vdot(J_u[1], dp)), float(jnp.vdot(J_p[0], du)), rtol=1e-12
    )


def test_jacobian_symmetry_stokes():
    """The Stokes+graddiv velocity block is symmetric."""
    form, V, Q = make_form(d=2, k=2)
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(V.ndof, 2))
    params = dict(nu=1.3, gamma=10.0, advect=0.0)
    f = lambda u: form.velocity_residual(u, params)
    x = jnp.asarray(rng.randn(V.ndof, 2))
    y = jnp.asarray(rng.randn(V.ndof, 2))
    _, Ax = jax.jvp(f, (w,), (x,))
    _, Ay = jax.jvp(f, (w,), (y,))
    assert np.isclose(float(jnp.vdot(Ax, y)), float(jnp.vdot(Ay, x)), rtol=1e-12)


def test_element_tensors_match_jvp():
    form, V, Q = make_form(d=2, k=2)
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(V.ndof, 2))
    params = dict(nu=0.5, gamma=4.0, advect=1.0)
    tensors = form.velocity_element_tensors(params, w)  # (nc, nl*2, nl*2)
    x = jnp.asarray(rng.randn(V.ndof, 2))
    _, Ax = jax.jvp(lambda u: form.velocity_residual(u, params), (w,), (x,))
    # assemble Ax from element tensors
    nl = V.element.nloc
    xl = x[V.cell_dofs].reshape(-1, nl * 2)
    yl = jnp.einsum("cab,cb->ca", tensors, xl).reshape(-1, nl, 2)
    Ax2 = jnp.zeros_like(x).at[jnp.asarray(V.cell_dofs)].add(yl)
    assert np.allclose(np.asarray(Ax), np.asarray(Ax2), atol=1e-9)


def test_fb_assembly_runs():
    mesh = unit_cube_mesh(2)
    V = VectorFunctionSpace(mesh, pk_facet_bubble(3, 1))
    Q = FunctionSpace(mesh, dg_lagrange(3, 0))
    form = NSForm(V, Q, "cell_avg")
    rng = np.random.RandomState(4)
    z = (jnp.asarray(rng.randn(V.ndof, 3)), jnp.asarray(rng.randn(Q.ndof)))
    params = dict(nu=1.0, gamma=1e4, advect=1.0)
    R = form.residual(z, params)
    assert np.all(np.isfinite(np.asarray(R[0])))


def test_pressure_mass_inverse():
    form, V, Q = make_form(kq=0)
    Minv = form.pressure_mass_inverse()
    vols = np.asarray(form.geom.vol)
    assert np.allclose(np.asarray(Minv)[:, 0, 0], 1.0 / vols)
