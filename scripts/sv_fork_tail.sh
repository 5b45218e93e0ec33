#!/bin/bash
# SV top-of-sweep A/B via tail forking (VERDICT r3 #7 / r4 #5): wait
# for the round-5 svb5 reference-pins sweep (smoothing 6, Burman 5e-3,
# 172,546 dofs) to finish, then re-solve ONLY the tail (Re > 8900, 11
# steps) under one changed knob per variant, warm-started from the
# base checkpoints.  Iteration counts are platform-independent; runs
# niced on the host CPU.
set -u
BASE=/root/repo/results/checkpoint_svb5/172546
LOGS=/root/repo/results/logs
while [ ! -f "$BASE/nssolution-Re-10000.npz" ]; do sleep 120; done

run_variant() {
  NAME="$1"; shift
  CKPT=/root/repo/results/checkpoint_$NAME/172546
  mkdir -p "$CKPT"
  cp -n "$BASE"/*.npz "$CKPT"/ 2>/dev/null
  # drop the tail so the variant re-solves it with its own knob
  for re in 9000 9100 9200 9300 9400 9500 9600 9700 9800 9900 10000; do
    rm -f "$CKPT/nssolution-Re-$re.npz"
  done
  echo "=== attempt $NAME $(date -u +'%F %T') [cpu tail-fork of svbase1]" >> "$LOGS/sv_ab_$NAME.log"
  ALFI_TPU_FORCE_CPU=1 JAX_PLATFORMS=cpu nice -n 19 \
    /root/repo/scripts/launch_snapshot.sh "$NAME" \
    python examples/iters.py --checkpoint --problem ldc2d \
    --nref-start 2 --nref-end 2 --baseN 16 --k 2 --solver-type almg \
    --discretisation sv --mh bary --stabilisation-type burman \
    --patch macro --restriction --re-max 10000 "$@" \
    >> "$LOGS/sv_ab_$NAME.log" 2>&1
}

run_variant svs10B --smoothing 10 --stabilisation-weight 5e-3
run_variant svw12B --stabilisation-weight 1e-2
