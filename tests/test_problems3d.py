"""3D pipeline + remaining problem-family tests (small configurations):
ldc3d ([P2+FB]^3 and [P1+FB]^3), bfs2d/dfg flows, 3D MMS."""

import jax.numpy as jnp
import pytest

from alfi_tpu import ConstantPressureSolver
from alfi_tpu.fem.errors import ErrorComputer
from alfi_tpu.problems import (
    DfgBenchmarkProblem,
    ThreeDimLidDrivenCavityMMSProblem,
    ThreeDimLidDrivenCavityProblem,
    TwoDimBackwardsFacingStepProblem,
)

pytestmark = pytest.mark.slow  # integration tier; fast gate = -m 'not slow'


@pytest.mark.parametrize("k", [1, 2])
def test_ldc3d_almg(k):
    s = ConstantPressureSolver(
        ThreeDimLidDrivenCavityProblem(2), nref=1, k=k,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    for re in [1, 100]:
        z, info = s.solve(re)
        assert info["converged"], (k, re)
        assert info["linear_iter"] / max(1, info["nonlinear_iter"]) <= 12
    assert float(jnp.linalg.norm(s.form.apply_divergence(z[0]))) < 1e-7


def test_bfs2d_almg():
    s = ConstantPressureSolver(
        TwoDimBackwardsFacingStepProblem(n=2), nref=1, k=2,
        solver_type="almg", hierarchy="uniform", gamma=1e4, verbose=False)
    for re in [1, 50, 100]:
        z, info = s.solve(re)
        assert info["converged"], re
    # outflow: net flux through the domain is positive (flow goes right)
    u = z[0]
    assert float(jnp.mean(u[:, 0])) > 0.0


def test_dfg_almg():
    s = ConstantPressureSolver(
        DfgBenchmarkProblem(n=30), nref=1, k=2, solver_type="almg",
        hierarchy="uniform", gamma=1e4, verbose=False)
    for re in [1, 20]:
        z, info = s.solve(re)
        assert info["converged"], re


def test_mms3d_errors_converge():
    errs = []
    for n in [2, 4]:
        problem = ThreeDimLidDrivenCavityMMSProblem(n)
        s = ConstantPressureSolver(
            problem, nref=0, k=2, solver_type="lu", hierarchy="uniform",
            gamma=1e4, verbose=False)
        z, info = s.solve(10)
        assert info["converged"]
        ec = ErrorComputer(s.form)
        ul2, uh1 = ec.velocity_errors(z[0], problem.u_exact)
        errs.append((float(ul2), float(uh1)))
    assert errs[1][0] < 0.5 * errs[0][0]
    assert errs[1][1] < 0.7 * errs[0][1]
