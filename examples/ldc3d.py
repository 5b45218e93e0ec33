"""3D lid-driven cavity (/root/reference/examples/ldc3d/ldc3d.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser, get_solver, run_solver
from alfi_tpu.problems import ThreeDimLidDrivenCavityProblem

if __name__ == "__main__":
    parser = get_default_parser()
    args, _ = parser.parse_known_args()
    problem = ThreeDimLidDrivenCavityProblem(args.baseN)
    solver = get_solver(args, problem)
    res = [1, 10, 100]
    run_solver(solver, res, args)
