"""Continuation must survive a diverged Re step.

The reference's recovery model is "a diverged Re leaves prior
checkpoints usable" (/root/reference/alfi/driver.py:111-120 +
SURVEY.md §5.3).  Round-2's nref=3 sweep showed what happens without
it: one divergence at Re=2200 poisoned solver.z, every later step
failed in one Newton iteration, and the garbage states were even
checkpointed so a resumed sweep skipped straight past the failures.

Three contracts:
 * NavierStokesSolver.solve keeps the last CONVERGED state when a
   solve diverges;
 * run_solver never writes a checkpoint for a diverged solve;
 * run_solver refuses to load legacy diverged checkpoints (retries).
"""

import numpy as np

import alfi_tpu.solver as solver_mod
from alfi_tpu import ConstantPressureSolver
from alfi_tpu.driver import get_default_parser, run_solver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem


def _tiny_solver():
    return ConstantPressureSolver(
        TwoDimLidDrivenCavityProblem(4), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4,
        verbose=False)


def test_diverged_solve_restores_last_state(monkeypatch):
    s = _tiny_solver()
    s.solve(1)
    z_good = s.z

    real_newton = solver_mod.newton

    def diverging_newton(residual, linear_solve, z0, **kw):
        z, info = real_newton(residual, linear_solve, z0,
                              **dict(kw, maxit=1, atol=0.0, rtol=0.0))
        info.converged = False
        info.reason = "forced divergence (test)"
        import jax.numpy as jnp

        return (jnp.full_like(z[0], jnp.nan), z[1]), info

    monkeypatch.setattr(solver_mod, "newton", diverging_newton)
    _, info = s.solve(10)
    assert not info["converged"]
    assert s.z is z_good  # poisoned iterate must not stick
    monkeypatch.setattr(solver_mod, "newton", real_newton)
    _, info2 = s.solve(10)  # continuation recovers from z_good
    assert info2["converged"]


def test_diverged_solve_not_checkpointed(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    s = _tiny_solver()
    real_newton = solver_mod.newton

    calls = {"n": 0}

    def newton_fail_at_10(residual, linear_solve, z0, **kw):
        z, info = real_newton(residual, linear_solve, z0, **kw)
        calls["n"] += 1
        if calls["n"] == 2:  # the Re=10 step
            info.converged = False
        return z, info

    monkeypatch.setattr(solver_mod, "newton", newton_fail_at_10)
    parser = get_default_parser()
    args, _ = parser.parse_known_args(
        ["--discretisation", "pkp0", "--checkpoint"])
    results = run_solver(s, [1, 10], args)
    chkptdir = tmp_path / ("checkpoint/%i" % s.Z.dim)
    assert (chkptdir / "nssolution-Re-1.npz").exists()
    assert not (chkptdir / "nssolution-Re-10.npz").exists()
    assert results[1]["converged"] and not results[10]["converged"]


def test_legacy_diverged_checkpoint_retried(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    s = _tiny_solver()
    chkptdir = tmp_path / ("checkpoint/%i" % s.Z.dim)
    chkptdir.mkdir(parents=True)
    u = np.full(np.asarray(s.z[0]).shape, np.nan)
    p = np.zeros(np.asarray(s.z[1]).shape)
    np.savez(chkptdir / "nssolution-Re-1.npz", u=u, p=p,
             nu=2.0, linear_iter=0, nonlinear_iter=1, time=0.0,
             converged=False)
    parser = get_default_parser()
    args, _ = parser.parse_known_args(
        ["--discretisation", "pkp0", "--checkpoint"])
    results = run_solver(s, [1], args)
    assert results[1]["converged"]  # re-solved, not loaded
    assert not results[1].get("checkpointed", False)
    with np.load(chkptdir / "nssolution-Re-1.npz") as chk:
        assert bool(chk["converged"])  # overwritten with the good solve
