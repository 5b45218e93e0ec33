"""shard_map-distributed almg vs the global single-program solver.

The decomposition (parallel/decompose.py) + distributed step
(parallel/distributed.py) must reproduce the global almg solver
bitwise-close (identical FGMRES iteration counts; dz equal to summation-
order roundoff) on the virtual 8-device CPU mesh — the TPU-world
equivalent of the reference's `mpirun -n N` checks (SURVEY.md §4)."""

import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem
from alfi_tpu.parallel import make_device_mesh
from alfi_tpu.parallel.distributed import DistributedSolver


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-300)


def _make(cls, **kw):
    problem = TwoDimLidDrivenCavityProblem(4)
    solver = cls(problem, nref=1, k=2, solver_type="almg", gamma=1e4,
                 verbose=False, **kw)
    solver.advect_val = 1.0
    solver.nu_val = solver.char_L * solver.char_U / 10.0
    return solver


CASES = [
    (ConstantPressureSolver, dict(hierarchy="uniform", patch="star")),
    (ScottVogeliusSolver, dict(hierarchy="bary", patch="macro")),
]


@pytest.mark.parametrize("cls,kw", CASES,
                         ids=["pkp0-star", "sv-macrostar"])
def test_distributed_linear_step_matches_global(cls, kw):
    solver = _make(cls, **kw)
    params = solver.params()
    mesh = make_device_mesh(8)
    dist = DistributedSolver(solver, mesh)
    z, _ = dist.shard_state(solver.z, params)

    Fd, fnorm_d = dist.residual(z, params)
    Fg = solver.residual_masked(solver.z, params)
    Fd_g = dist.gather_state(Fd)
    assert rel(Fd_g[0], Fg[0]) < 1e-14
    assert rel(Fd_g[1], Fg[1]) < 1e-14

    tstate_g = solver._transfer_setup(params)
    dz_g, its_g = solver._linear_step(solver.z, Fg, params, tstate_g)
    dz_d, its_d = dist.linear_step(z, Fd, params, dist.transfer_setup(params))
    assert its_d == int(its_g)
    dz_dg = dist.gather_state(dz_d)
    assert rel(dz_dg[0], dz_g[0]) < 1e-9
    assert rel(dz_dg[1], dz_g[1]) < 1e-9


def test_distributed_continuation_solve():
    solver = _make(ConstantPressureSolver, hierarchy="uniform",
                   patch="star")
    mesh = make_device_mesh(8)
    dist = DistributedSolver(solver, mesh)
    _, info = dist.solve(10)
    assert info["converged"]

    ref = _make(ConstantPressureSolver, hierarchy="uniform", patch="star")
    _, info_g = ref.solve(10)
    assert info["linear_iter"] == info_g["linear_iter"]
    assert info["nonlinear_iter"] == info_g["nonlinear_iter"]
    assert rel(solver.z[0], ref.z[0]) < 1e-10
    assert rel(solver.z[1], ref.z[1]) < 1e-8


def test_make_device_mesh_refuses_truncation():
    import jax

    n = len(jax.devices())
    with pytest.raises(RuntimeError):
        make_device_mesh(n + 1)


def test_load_balance_report(capsys):
    """The reference's load_balance analogue: per-device owned cells and
    fine-level velocity dofs, balanced within a reasonable ratio by the
    coarse partition."""
    import numpy as np

    from alfi_tpu import ConstantPressureSolver
    from alfi_tpu.parallel.distributed import DistributedSolver
    from alfi_tpu.parallel.sharding import make_device_mesh
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    s = ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(8), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", verbose=False)
    dist = DistributedSolver(s, make_device_mesh(4))
    stats = dist.load_balance()
    out = capsys.readouterr().out
    assert "Load balance" in out
    for name, c in stats.items():
        assert c.sum() > 0
        assert len(c) == 4
        # partition is balanced (generous bound: coarse blocks on a
        # small mesh)
        assert c.max() <= 3 * max(1, c.min()), (name, c)
