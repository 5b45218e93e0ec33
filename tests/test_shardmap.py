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
