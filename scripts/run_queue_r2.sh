#!/bin/bash
# Round-2 TPU measurement queue (single v5e chip, serialized).
# Each stage appends to its own log under results/logs/; safe to re-run
# (XLA compile cache persists; iters.py reruns recompute).
set -x
cd /root/repo
mkdir -p results/logs

# A2. SV headline: ldc2d sv k=2 bary macrostar Burman 5e-3, Re->10000,
#     nref 1-2 (the reference Makefile iters2dsv protocol)
timeout 14400 python examples/iters.py --problem ldc2d --nref-start 1 \
  --nref-end 2 --baseN 10 --k 2 --solver-type almg --discretisation sv \
  --mh bary --stabilisation-type burman --patch macro --smoothing 6 \
  --restriction --stabilisation-weight 5e-3 --re-max 10000 \
  > results/logs/sv_ldc2d_k2_nref12_re10000.log 2>&1

# B. 3D north star: ldc3d [P2+FB]^3-P0 SUPG almg, Re->5000, nref=1
timeout 14400 python examples/iters.py --problem ldc3d --nref-start 1 \
  --nref-end 1 --baseN 4 --k 2 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --patch star --smoothing 10 \
  --restriction --re-max 5000 \
  > results/logs/ldc3d_p2fb_nref1_re5000.log 2>&1

# D2. [P1+FB]^3 end-to-end (BubbleTransfer in anger), short sweep
timeout 7200 python examples/iters.py --problem ldc3d --nref-start 1 \
  --nref-end 1 --baseN 4 --k 1 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --stabilisation-weight 0.05 \
  --patch star --smoothing 10 --restriction --re-max 1000 \
  > results/logs/ldc3d_p1fb_nref1_re1000.log 2>&1

# C. 2D robustness row at nref=3 (166k dofs), Re->10000
timeout 21600 python examples/iters.py --problem ldc2d --nref-start 3 \
  --nref-end 3 --baseN 16 --k 2 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --patch star --restriction \
  --re-max 10000 \
  > results/logs/iters_ldc2d_nref3_re10000.log 2>&1

echo QUEUE_DONE
