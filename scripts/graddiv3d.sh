#!/bin/bash
# 3D graddiv comparison (VERDICT r4 item 8): gamma-sweep x smoother x
# transfer for the velocity-block MG in 3D, mirroring the reference's
# pkp03dcomparison / sv3dcomparison targets
# (/root/reference/examples/graddiv/Makefile) at single-chip scale
# (their nref=1 rows).  Each run prints its own LaTeX gamma/iters
# table; the stage log is the artifact.
set -u
cd "$(dirname "$0")/.."

run() {
    echo "=== graddiv3d $* ==="
    timeout 2400 python examples/graddiv.py "$@" 2>&1
}

# pkp0 3D (k=1 [P1+FB]^3, baseN=4 nref=1; Makefile pkp03dcomparison)
P="--dim 3 --discretisation pkp0 --k 1 --baseN 4 --nref 1"
run $P --smoother patch --transfer
run $P --smoother patch
run $P --smoother jacobi --transfer
run $P --smoother jacobi
run $P --smoother amg

# sv 3D (k=3 bary macrostar, baseN=2 nref=1; Makefile sv3dcomparison)
S="--dim 3 --discretisation sv --k 3 --baseN 2 --nref 1 --mh bary --patch macro"
run $S --smoother patch --transfer
run $S --smoother patch
run $S --smoother jacobi --transfer
run $S --smoother jacobi
run $S --smoother amg
echo "=== graddiv3d complete ==="
