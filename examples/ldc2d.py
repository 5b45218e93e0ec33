"""2D lid-driven cavity (/root/reference/examples/ldc2d/ldc2d.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser, get_solver, run_solver
from alfi_tpu.problems import TwoDimLidDrivenCavityProblem

if __name__ == "__main__":
    parser = get_default_parser()
    parser.add_argument("--diagonal", type=str, default="left",
                        choices=["left", "right", "crossed"])
    args, _ = parser.parse_known_args()
    problem = TwoDimLidDrivenCavityProblem(args.baseN, args.diagonal)
    solver = get_solver(args, problem)
    res = [1, 10, 50, 100, 150, 200]
    run_solver(solver, res, args)
