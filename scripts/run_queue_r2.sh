#!/bin/bash
# Round-2 TPU measurement queue (single v5e chip, serialized — the axon
# tunnel only supports ~2 clients and serializes remote compiles anyway).
# Each stage runs from an immutable snapshot of HEAD so later source
# edits can't race in-flight imports; logs go to absolute paths.
# Before each stage we wait for the tunnel to be reachable (outages of
# tens of minutes happen) and retry a failed stage once — a stage log
# ending in a device/tunnel error otherwise loses the whole slot.
# Safe to re-run: XLA compile cache persists, iters.py recomputes.
set -x
cd /root/repo
mkdir -p results/logs
LOGS=/root/repo/results/logs
SNAP=/root/repo/scripts/launch_snapshot.sh

wait_tpu() {
  # block (up to ~4h) until the axon backend initialises
  for i in $(seq 1 60); do
    if timeout 240 python -c \
        "import jax; assert jax.devices()[0].platform != 'cpu'" \
        >/dev/null 2>&1; then
      return 0
    fi
    sleep 240
  done
  return 1
}

stage() {
  # stage <name> <timeout_s> <log> <cmd...>
  local name="$1" tmo="$2" log="$3"; shift 3
  for attempt in 1 2; do
    wait_tpu || return 1
    echo "=== stage $name attempt $attempt $(date -u +%H:%M:%S)" >> "$log"
    if timeout "$tmo" "$SNAP" "$name" "$@" >> "$log" 2>&1; then
      return 0
    fi
    # converged partial results still count; only retry on early death
    local solves
    solves=$(grep -c "Nonlinear solve converged" "$log" || true)
    [ "${solves:-0}" -ge 20 ] && return 0
  done
  return 0
}

# B. 3D north star (VERDICT item 2): ldc3d [P2+FB]^3-P0 SUPG almg,
#    Re->5000, nref=1
stage b 14400 $LOGS/ldc3d_p2fb_nref1_re5000.log \
  python examples/iters.py --checkpoint --problem ldc3d \
  --nref-start 1 --nref-end 1 --baseN 4 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --smoothing 10 --restriction --re-max 5000

# A2. SV headline (VERDICT item 3): ldc2d sv k=2 bary macrostar Burman,
#     Re->10000, nref 1-2 (reference Makefile iters2dsv protocol)
stage a2 14400 $LOGS/sv_ldc2d_k2_nref12_re10000.log \
  python examples/iters.py --checkpoint --problem ldc2d \
  --nref-start 1 --nref-end 2 --baseN 10 --k 2 --solver-type almg \
  --discretisation sv --mh bary --stabilisation-type burman \
  --patch macro --smoothing 6 --restriction \
  --stabilisation-weight 5e-3 --re-max 10000

# C. 2D robustness + scale row at nref=3 (166k dofs), Re->10000
#    (VERDICT items 4 + 10)
stage c 21600 $LOGS/iters_ldc2d_nref3_re10000.log \
  python examples/iters.py --checkpoint --problem ldc2d \
  --nref-start 3 --nref-end 3 --baseN 16 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --restriction --re-max 10000

# C2. scale stretch: nref=4 (664k dofs) short sweep for the DoF/s
#     trend (VERDICT weak 1: show the chip leaving the latency-bound
#     regime)
stage c2 14400 $LOGS/iters_ldc2d_nref4_re1000.log \
  python examples/iters.py --checkpoint --problem ldc2d \
  --nref-start 4 --nref-end 4 --baseN 16 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --restriction --re-max 1000

# E. bfs2d on the real reference coarse mesh (host-telescoped sparse
#    coarse above the dense cap — VERDICT item 5 "done" criterion)
stage e 14400 $LOGS/iters_bfs2d_coarse12_nref1_re1000.log \
  python examples/iters.py --checkpoint --problem bfs2d \
  --mesh tests/fixtures/bfs2d_coarse12.msh --nref-start 1 --nref-end 1 \
  --baseN 0 --k 2 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --patch star --smoothing 10 \
  --restriction --re-max 1000

# R. roofline placement of the patch apply (VERDICT item 8)
stage r 7200 $LOGS/roofline_patches.log \
  python scripts/roofline_patches.py

# D2. [P1+FB]^3 end-to-end (BubbleTransfer in anger), short sweep
stage d2 7200 $LOGS/ldc3d_p1fb_nref1_re1000.log \
  python examples/iters.py --checkpoint --problem ldc3d \
  --nref-start 1 --nref-end 1 --baseN 4 --k 1 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --stabilisation-weight 0.05 --patch star --smoothing 10 \
  --restriction --re-max 1000

# Z. bench sanity (the driver reruns this at round end)
stage z 7200 $LOGS/bench_r2.log python bench.py

echo QUEUE_DONE
