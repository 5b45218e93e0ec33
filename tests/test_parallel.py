"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py) —
the TPU-world analogue of the reference's ``mpirun -n 12`` local testing
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, (z, params) = g.entry()
    out = jax.jit(fn)(z, params)
    assert np.isfinite(float(jnp.max(jnp.abs(out[0]))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """The sharded Newton step must compute the same update as the
    unsharded one (GSPMD changes layout, not semantics)."""
    import __graft_entry__ as g
    from alfi_tpu.parallel import make_device_mesh, shard_solver_arrays
    from alfi_tpu.parallel.sharding import sharded_newton_step

    solver = g._make_solver()
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 10.0
    params = solver.params()
    F = solver._residual_jit(solver.z, params)
    dz, _ = solver._linear_step(solver.z, F, params)
    z_ref = (solver.z[0] + dz[0], solver.z[1] + dz[1])

    mesh = make_device_mesh(8)
    zs, ps = shard_solver_arrays(solver, mesh)
    step = sharded_newton_step(solver, mesh)
    z2, _ = step(zs, ps)
    nu = solver.Z.V.ndof
    npr = solver.Z.Q.ndof
    du = float(jnp.max(jnp.abs(np.asarray(z2[0])[:nu] - z_ref[0])))
    dp = float(jnp.max(jnp.abs(np.asarray(z2[1])[:npr] - z_ref[1])))
    assert du < 1e-9 and dp < 1e-9
