"""2D backwards-facing step (/root/reference/examples/bfs2d/bfs2d.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser, get_solver, run_solver
from alfi_tpu.problems import TwoDimBackwardsFacingStepProblem

if __name__ == "__main__":
    parser = get_default_parser()
    parser.add_argument("--mesh", type=str, default=None,
                        help="optional gmsh .msh file (MSH 2.2)")
    parser.add_argument("--n", type=int, default=4,
                        help="cells per unit length (generated mesh)")
    args, _ = parser.parse_known_args()
    problem = TwoDimBackwardsFacingStepProblem(args.mesh, n=args.n)
    solver = get_solver(args, problem)
    res = [1, 10, 50, 100, 150, 200, 250]
    run_solver(solver, res, args)
