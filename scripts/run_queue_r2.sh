#!/bin/bash
# Round-2 TPU measurement queue (single v5e chip, serialized — the axon
# tunnel only supports ~2 clients and serializes remote compiles anyway).
# Each stage runs from an immutable snapshot of HEAD so later source
# edits can't race in-flight imports; logs go to absolute paths.
# Safe to re-run: XLA compile cache persists, iters.py recomputes.
set -x
cd /root/repo
mkdir -p results/logs
LOGS=/root/repo/results/logs
SNAP=/root/repo/scripts/launch_snapshot.sh

# B. 3D north star (VERDICT item 2): ldc3d [P2+FB]^3-P0 SUPG almg,
#    Re->5000, nref=1
timeout 14400 $SNAP b python examples/iters.py --problem ldc3d \
  --nref-start 1 --nref-end 1 --baseN 4 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --smoothing 10 --restriction --re-max 5000 \
  > $LOGS/ldc3d_p2fb_nref1_re5000.log 2>&1

# A2. SV headline (VERDICT item 3): ldc2d sv k=2 bary macrostar Burman,
#     Re->10000, nref 1-2 (reference Makefile iters2dsv protocol)
timeout 14400 $SNAP a2 python examples/iters.py --problem ldc2d \
  --nref-start 1 --nref-end 2 --baseN 10 --k 2 --solver-type almg \
  --discretisation sv --mh bary --stabilisation-type burman \
  --patch macro --smoothing 6 --restriction \
  --stabilisation-weight 5e-3 --re-max 10000 \
  > $LOGS/sv_ldc2d_k2_nref12_re10000.log 2>&1

# C. 2D robustness + scale row at nref=3 (166k dofs), Re->10000
#    (VERDICT items 4 + 10)
timeout 21600 $SNAP c python examples/iters.py --problem ldc2d \
  --nref-start 3 --nref-end 3 --baseN 16 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --restriction --re-max 10000 \
  > $LOGS/iters_ldc2d_nref3_re10000.log 2>&1

# E. bfs2d on the real reference coarse mesh (host-telescoped sparse
#    coarse above the dense cap — VERDICT item 5 "done" criterion)
timeout 14400 $SNAP e python examples/iters.py --problem bfs2d \
  --mesh tests/fixtures/bfs2d_coarse12.msh --nref-start 1 --nref-end 1 \
  --baseN 0 --k 2 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --patch star --smoothing 10 \
  --restriction --re-max 1000 \
  > $LOGS/iters_bfs2d_coarse12_nref1_re1000.log 2>&1

# R. roofline placement of the patch apply (VERDICT item 8)
timeout 7200 $SNAP r python scripts/roofline_patches.py \
  > $LOGS/roofline_patches.log 2>&1

# D2. [P1+FB]^3 end-to-end (BubbleTransfer in anger), short sweep
timeout 7200 $SNAP d2 python examples/iters.py --problem ldc3d \
  --nref-start 1 --nref-end 1 --baseN 4 --k 1 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --stabilisation-weight 0.05 --patch star --smoothing 10 \
  --restriction --re-max 1000 \
  > $LOGS/ldc3d_p1fb_nref1_re1000.log 2>&1

# Z. bench sanity (the driver reruns this at round end)
timeout 7200 $SNAP z python bench.py > $LOGS/bench_r2.log 2>&1

echo QUEUE_DONE
