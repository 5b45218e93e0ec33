"""Iteration script: distributed almg vs global almg on the virtual
8-device CPU mesh (same checks as tests/test_distributed.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from alfi_tpu import ConstantPressureSolver  # noqa: E402
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem  # noqa: E402
from alfi_tpu.parallel import make_device_mesh  # noqa: E402
from alfi_tpu.parallel.distributed import DistributedSolver  # noqa: E402


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-300)


def main():
    problem = TwoDimLidDrivenCavityProblem(4)
    solver = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 10.0
    params = solver.params()

    mesh = make_device_mesh(8)
    dist = DistributedSolver(solver, mesh)
    print("decomposition built")

    z, pr = dist.shard_state(solver.z, params)

    # 1. residual agreement
    Fd, fnorm_d = dist.residual(z, params)
    F_g = solver.residual_masked(solver.z, params)
    Fg_u, Fg_p = np.asarray(F_g[0]), np.asarray(F_g[1])
    Fd_g = dist.gather_state(Fd)
    print("residual rel err u:", rel(Fd_g[0], Fg_u))
    print("residual rel err p:", rel(Fd_g[1], Fg_p))
    from alfi_tpu.utils.tree import tnorm
    print("fnorm dist vs global:", fnorm_d, float(tnorm(F_g)))

    # 2. linear step agreement
    tstate_g = solver._transfer_setup(params)
    dz_g, its_g = solver._linear_step(solver.z, F_g, params, tstate_g)
    tstate = dist.transfer_setup(params)
    dz_d, its_d = dist.linear_step(z, Fd, params, tstate)
    dz_dg = dist.gather_state(dz_d)
    print("iters dist", its_d, "global", int(its_g))
    print("dz rel err u:", rel(dz_dg[0], dz_g[0]))
    print("dz rel err p:", rel(dz_dg[1], dz_g[1]))

    # 3. full distributed continuation solve
    z1, info = dist.solve(10)
    print("dist solve info:", info)

    solver2 = ConstantPressureSolver(
        problem, nref=1, k=2, solver_type="almg", hierarchy="uniform",
        gamma=1e4, verbose=False)
    z2, info2 = solver2.solve(10)
    print("global solve info:", {k: info2[k] for k in
                                 ("linear_iter", "nonlinear_iter",
                                  "converged")})
    print("solution rel err u:", rel(z1[0], z2[0][0] if isinstance(z2, tuple) and isinstance(z2[0], tuple) else solver2.z[0]))
    print("solution rel err p:", rel(z1[1], solver2.z[1]))


if __name__ == "__main__":
    main()
