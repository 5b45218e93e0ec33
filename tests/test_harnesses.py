"""Smoke tests for the experiment harness CLIs (iters/mms/graddiv +
problem mains), at tiny configurations."""

import runpy
import sys

import pytest


pytestmark = pytest.mark.slow  # integration tier; fast gate = -m 'not slow'

def run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = old


def test_iters_harness_ldc2d(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run_cli("/root/repo/examples/iters.py", [
        "--problem", "ldc2d", "--discretisation", "pkp0", "--baseN", "4",
        "--k", "2", "--nref-start", "1", "--nref-end", "1",
        "--re-max", "10", "--solver-type", "almg", "--mh", "uniform"])


def test_mms_harness(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    run_cli("/root/repo/examples/mms.py", [
        "--dim", "2", "--discretisation", "pkp0", "--baseN", "4",
        "--k", "2", "--nref", "2", "--solver-type", "lu",
        "--mh", "uniform"])
    out = capsys.readouterr().out
    assert "convergence orders" in out
    assert "pgfplotstableread" in out


def test_graddiv_harness(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    run_cli("/root/repo/examples/graddiv.py", [
        "--dim", "2", "--discretisation", "pkp0", "--baseN", "4",
        "--nref", "1", "--k", "2", "--smoother", "patch", "--transfer"])
    out = capsys.readouterr().out
    assert "iters:" in out


def test_ldc2d_main_with_checkpoint_and_paraview(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import numpy as np

    # tiny Re sweep via the problem main's default list would be long;
    # use run_solver directly with the main's wiring
    sys.path.insert(0, "/root/repo")
    from alfi_tpu import get_default_parser, get_solver, run_solver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    parser = get_default_parser()
    args, _ = parser.parse_known_args(
        ["--discretisation", "pkp0", "--baseN", "4", "--nref", "1",
         "--k", "2", "--solver-type", "almg", "--mh", "uniform",
         "--checkpoint", "--paraview", "--nref-vis", "1"])
    problem = TwoDimLidDrivenCavityProblem(args.baseN)
    solver = get_solver(args, problem)
    results = run_solver(solver, [1, 10], args)
    assert all(r["converged"] for r in results.values())
    # resume path: re-running must load checkpoints and solve nothing;
    # the stored info dicts must reproduce the TRUE iteration counts so
    # iters tables survive resume exactly
    solver2 = get_solver(args, problem)
    results2 = run_solver(solver2, [1, 10], args)
    assert set(results2) == {1, 10}
    assert all(r.get("checkpointed") for r in results2.values()), \
        "checkpoints should have been loaded, not re-solved"
    for re in (1, 10):
        assert results2[re]["linear_iter"] == results[re]["linear_iter"]
        assert (results2[re]["nonlinear_iter"]
                == results[re]["nonlinear_iter"])
    # paraview output exists
    import glob

    assert glob.glob("output/*/velocity-Re-*.vtu")
    assert glob.glob("output/*/velocity-refined-Re-*.vtu")


def test_ndevices_flag_runs_distributed(tmp_path, monkeypatch):
    """--ndevices N is the mpirun -n N analogue: get_solver wraps the
    solver in a DistributedSolver over an N-device mesh and run_solver
    drives it unchanged (same counts as the single-device solve)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    from alfi_tpu import get_default_parser, get_solver, run_solver
    from alfi_tpu.parallel.distributed import DistributedSolver
    from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

    parser = get_default_parser()
    argv = ["--discretisation", "pkp0", "--baseN", "4", "--nref", "1",
            "--k", "2", "--solver-type", "almg", "--mh", "uniform",
            "--stabilisation-type", "supg"]
    args, _ = parser.parse_known_args(argv + ["--ndevices", "8"])
    problem = TwoDimLidDrivenCavityProblem(args.baseN)
    dist = get_solver(args, problem)
    assert isinstance(dist, DistributedSolver)
    results = run_solver(dist, [1, 10], args)
    assert all(r["converged"] for r in results.values())
    assert all(r["time"] > 0 for r in results.values())

    args1, _ = parser.parse_known_args(argv)
    ref = get_solver(args1, TwoDimLidDrivenCavityProblem(args1.baseN))
    results1 = run_solver(ref, [1, 10], args1)
    for re in (1, 10):
        assert results[re]["linear_iter"] == results1[re]["linear_iter"]
        assert (results[re]["nonlinear_iter"]
                == results1[re]["nonlinear_iter"])
