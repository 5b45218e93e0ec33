"""MMS convergence-order gates (SURVEY.md §4 item 1).

Encodes the reference's experiment-as-test
(/root/reference/examples/mms.py): solving the Shih-Tan-Hwang cavity,
errors must converge at textbook orders, and Scott-Vogelius velocity
fields must be pointwise divergence-free."""

import numpy as np
import pytest

from alfi_tpu import ConstantPressureSolver, ScottVogeliusSolver
from alfi_tpu.fem.errors import ErrorComputer
from alfi_tpu.problems import TwoDimLidDrivenCavityMMSProblem


pytestmark = pytest.mark.slow  # integration tier; fast gate = -m 'not slow'

def run_mms(solver_cls, baseN, k, hierarchy, re, **kw):
    problem = TwoDimLidDrivenCavityMMSProblem(baseN)
    s = solver_cls(problem, nref=0, k=k, solver_type="lu",
                   hierarchy=hierarchy, gamma=1e4, verbose=False, **kw)
    z, info = s.solve(re)
    assert info["converged"]
    ec = ErrorComputer(s.form)
    nu = s.nu_val
    ul2, uh1 = ec.velocity_errors(z[0], problem.u_exact)
    pl2 = ec.pressure_error(z[1], lambda x: problem.p_exact(x, nu))
    div = ec.divergence_norm(z[0])
    return dict(ul2=float(ul2), uh1=float(uh1), pl2=float(pl2),
                div=float(div))


def orders(errs, key):
    e = np.array([r[key] for r in errs])
    return np.log2(e[:-1] / e[1:])


@pytest.mark.parametrize("re", [1, 50])
def test_sv_convergence_orders(re):
    """[P2]^2-DG1 Scott-Vogelius on Alfeld meshes: u L2 ~ h^3, u H1 ~ h^2,
    p ~ h^2, div u ~ 0."""
    errs = [run_mms(ScottVogeliusSolver, n, 2, "bary", re)
            for n in [4, 8, 16]]
    # coarse meshes are pre-asymptotic: require the asymptotic trend
    # (orders increasing, finest-pair order near the theoretical one)
    assert orders(errs, "ul2").mean() > 2.6
    uh1 = orders(errs, "uh1")
    assert uh1[-1] > 1.7 and uh1.mean() > 1.5
    pl2 = orders(errs, "pl2")
    assert pl2[-1] > 1.2 and pl2.mean() > 1.1
    for r in errs:
        assert r["div"] < 1e-7, "SV must be pointwise divergence-free"


def test_pkp0_convergence():
    """[P2]^2-P0: first-order pair — u H1 and p L2 converge at O(h)."""
    errs = [run_mms(ConstantPressureSolver, n, 2, "uniform", 10)
            for n in [4, 8, 16]]
    assert orders(errs, "uh1").min() > 0.8
    assert orders(errs, "pl2").min() > 0.8
    assert orders(errs, "ul2").min() > 1.5
