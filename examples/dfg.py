"""DFG cylinder benchmark (/root/reference/examples/dfg/dfg.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser, get_solver, run_solver
from alfi_tpu.problems import DfgBenchmarkProblem

if __name__ == "__main__":
    parser = get_default_parser()
    parser.add_argument("--mesh", type=str, default=None)
    parser.add_argument("--n", type=int, default=40)
    # reference ladder: [1, 10, 20, 50] with the commented extension
    # to 500 (/root/reference/examples/dfg/dfg.py:56) — --re-max > 50
    # turns the extension on
    parser.add_argument("--re-max", type=int, default=50)
    args, _ = parser.parse_known_args()
    problem = DfgBenchmarkProblem(args.mesh, n=args.n)
    solver = get_solver(args, problem)
    res = [r for r in [1, 10, 20, 50, 100, 200, 400, 500]
           if r <= args.re_max]
    run_solver(solver, res, args)
