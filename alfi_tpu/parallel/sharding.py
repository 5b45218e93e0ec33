"""Multi-device sharding of the solver state (SURVEY.md §5.8).

The reference's ONLY parallelism is MPI domain decomposition of the mesh
(SURVEY.md §2d — no TP/PP/EP exists in the reference); its TPU-native
analogue is sharding the dof/cell arrays of one global problem over a
``jax.sharding.Mesh`` and letting XLA insert the collectives (the
halo-exchange pattern of overlap-1/2 partitions becomes gather traffic on
ICI; Krylov dot products become psums).

This module provides the GSPMD formulation: dof-blocked NamedShardings on
the solution pytree + jit of the existing pure step functions.  XLA
propagates the sharding through assembly (vmap over cells + segment-sum),
the patch smoother (batched LU over patches) and the Krylov loops.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices=None, axis="mesh"):
    """Build a 1D device mesh over exactly ``n_devices`` devices.

    Raises when fewer devices are visible instead of silently truncating:
    an n-device sharding claim must never be "validated" on a smaller
    mesh (a 1-chip host faking an 8-device dryrun)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_device_mesh: {n_devices} devices requested but only "
                f"{len(devs)} visible ({jax.default_backend()}); set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} JAX_PLATFORMS=cpu for a virtual mesh")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to(n, m):
    return (n + m - 1) // m * m


def _pad_rows(a, n):
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(np.asarray(a), pad)


def shard_solver_arrays(solver, mesh, axis="mesh"):
    """Place the solver state on the device mesh: dof arrays sharded on
    their leading (dof) axis (zero-padded to a device multiple — the
    analogue of DMPlex partition padding), params replicated."""
    n = mesh.devices.size
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    u, p = solver.z
    z = (
        jax.device_put(_pad_rows(u, _pad_to(u.shape[0], n)), sh),
        jax.device_put(_pad_rows(p, _pad_to(p.shape[0], n)), sh),
    )
    params = {k: jax.device_put(np.asarray(v), rep)
              for k, v in solver.params().items()}
    return z, params


def sharded_newton_step(solver, mesh, axis="mesh"):
    """One full Newton step (residual -> preconditioned FGMRES solve ->
    update), jitted over the device mesh; operates on the padded sharded
    state from shard_solver_arrays.  This is the framework's "training
    step": repeated application is the Reynolds-continuation inner loop."""
    sh = NamedSharding(mesh, P(axis))
    nu = solver.Z.V.ndof
    npr = solver.Z.Q.ndof

    def step(zp, params):
        z = (zp[0][:nu], zp[1][:npr])
        F = solver.residual_masked(z, params)
        # nested jit is inlined into the outer program
        dz, its = solver._linear_step(z, F, params)
        unew = z[0] + dz[0]
        pnew = z[1] + dz[1]
        out = (
            jnp_pad(unew, zp[0].shape[0]),
            jnp_pad(pnew, zp[1].shape[0]),
        )
        return out, its

    return jax.jit(
        step,
        in_shardings=((sh, sh), None),
        out_shardings=((sh, sh), None),
    )


def jnp_pad(a, n):
    import jax.numpy as jnp

    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)
