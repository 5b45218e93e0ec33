"""Velocity-block gamma-robustness study
(/root/reference/examples/graddiv/graddiv.py): sweep gamma in
{0,1,10,...,1e8} for a chosen smoother x transfer combination and print
the LaTeX iteration table.

Usage:
  python examples/graddiv.py --dim 2 --discretisation pkp0 \\
      --smoother patch --transfer --baseN 8 --nref 2 --k 2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alfi_tpu import get_default_parser
from alfi_tpu.graddiv import GradDivSolver

GAMMAS = [0.0, 1.0, 1e1, 1e2, 1e3, 1e4, 1e6, 1e8]


def main():
    parser = get_default_parser()
    parser.add_argument("--dim", type=int, required=True, choices=[2, 3])
    parser.add_argument("--transfer", dest="transfer", default=False,
                        action="store_true")
    parser.add_argument("--diagonal", type=str, default="left",
                        choices=["left", "right", "crossed"])
    parser.add_argument("--smoother", type=str, required=True,
                        choices=["patch", "jacobi", "amg"])
    args, _ = parser.parse_known_args()

    s = GradDivSolver(
        dim=args.dim, baseN=args.baseN, nref=args.nref, k=args.k,
        discretisation=args.discretisation, hierarchy=args.mh,
        patch=args.patch, smoother=args.smoother, transfer=args.transfer,
        diagonal=args.diagonal,
        smoothing=args.smoothing if args.smoothing else 3)

    iters = []
    for g in GAMMAS:
        try:
            _, its, conv = s.solve(g)
            iters.append(str(its) if conv else ">200")
        except Exception:
            iters.append(">200")
        print(f"gamma = {g:g}: {iters[-1]} iterations")

    print("gamma:   " + "\t& ".join("%g" % g for g in GAMMAS) + "\\\\")
    print("iters:   " + "\t& ".join(iters) + "\\\\")


if __name__ == "__main__":
    main()
