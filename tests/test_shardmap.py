"""shard_map halo-exchange assembly must reproduce the global assembly
bit-for-bit (up to summation order) on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from alfi_tpu.fem import (
    FunctionSpace,
    MixedFunctionSpace,
    NSForm,
    VectorFunctionSpace,
    dg_lagrange,
    lagrange,
)
from alfi_tpu.fem.bcs import BCSet, DirichletBC
from alfi_tpu.mesh import rectangle_mesh
from alfi_tpu.parallel.shardmap import DistributedResidual, partition_cells
from alfi_tpu.parallel.sharding import make_device_mesh


def test_distributed_velocity_residual_matches_global():
    mesh = rectangle_mesh(8, 8, 2, 2)
    V = VectorFunctionSpace(mesh, lagrange(2, 2))
    Q = FunctionSpace(mesh, dg_lagrange(2, 0))
    Z = MixedFunctionSpace(V, Q)
    form = NSForm(V, Q, graddiv_mode="cell_avg")
    bcset = BCSet(Z, [DirichletBC(V, (0.0, 0.0), None)])
    params = {
        "nu": jnp.asarray(0.01),
        "gamma": jnp.asarray(1e4),
        "advect": jnp.asarray(1.0),
    }

    dmesh = make_device_mesh(8)
    blocks = partition_cells(mesh, 8)
    dist = DistributedResidual(form, bcset, "mesh", blocks)

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(V.ndof, 2)))

    r_global = form.velocity_residual(u, params)

    ub = dist.scatter_state(u)
    fn = dist.make_residual(dmesh, params)
    args = (ub, ub, dist.jinv_b, dist.detj_b, dist.vol_b, dist.lcd,
            dist.dead, dist.lidx, dist.sslot)
    rb = fn(*args)
    r_dist = dist.gather_state(rb)

    err = float(jnp.max(jnp.abs(r_dist - r_global)))
    scale = float(jnp.max(jnp.abs(r_global)))
    assert err < 1e-10 * max(1.0, scale), err


def test_distributed_cg_matches_global():
    """Full Krylov loop inside shard_map (matvec + halo psum + owner-
    weighted dots) vs the global CG."""
    from alfi_tpu.solvers.krylov import cg

    mesh = rectangle_mesh(6, 6, 2, 2)
    V = VectorFunctionSpace(mesh, lagrange(2, 2))
    Q = FunctionSpace(mesh, dg_lagrange(2, 0))
    Z = MixedFunctionSpace(V, Q)
    form = NSForm(V, Q, graddiv_mode="cell_avg")
    bcset = BCSet(Z, [DirichletBC(V, (0.0, 0.0), None)])
    params = {
        "nu": jnp.asarray(1.0),
        "gamma": jnp.asarray(1.0),
        "advect": jnp.asarray(0.0),
    }
    wind = jnp.zeros((V.ndof, 2))
    tensors = form.velocity_element_tensors(params, wind)

    dmesh = make_device_mesh(8)
    blocks = partition_cells(mesh, 8)
    dist = DistributedResidual(form, bcset, "mesh", blocks)
    solve = dist.make_distributed_cg(dmesh, tensors, rtol=1e-10,
                                     maxit=500)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(V.ndof, 2))) * bcset.mask[0]
    x_dist, its = solve(b)
    assert its < 500

    mask = bcset.mask[0]
    rows = jnp.asarray(np.asarray(
        V.cell_dofs[:, :, None] * 2 + np.arange(2)).reshape(
            len(form.geom.detj), -1))

    def A(v):
        v0 = (mask * v).reshape(-1)
        rloc = jnp.einsum("cij,cj->ci", tensors, v0[rows])
        r = jnp.zeros((V.ndof * 2,)).at[rows].add(rloc)
        r = r.reshape(-1, 2)
        return mask * r + (1.0 - mask) * v

    x_ref, info = cg(A, b, rtol=1e-10, maxit=500)
    err = float(jnp.max(jnp.abs(x_dist - x_ref)))
    assert err < 1e-7 * max(1.0, float(jnp.max(jnp.abs(x_ref)))), err
