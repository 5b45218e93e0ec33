"""3D backwards-facing step (/root/reference/examples/bfs3d/bfs3d.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser, get_solver, run_solver
from alfi_tpu.problems import ThreeDimBackwardsFacingStepProblem

if __name__ == "__main__":
    parser = get_default_parser()
    parser.add_argument("--mesh", type=str, default=None)
    parser.add_argument("--n", type=int, default=2)
    args, _ = parser.parse_known_args()
    problem = ThreeDimBackwardsFacingStepProblem(args.mesh, n=args.n)
    solver = get_solver(args, problem)
    res = [1, 10, 100]
    run_solver(solver, res, args)
