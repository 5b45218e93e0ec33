#!/bin/bash
# Follow-on TPU measurement queue: transposed-layout experiments
# (solvers/patch_pallas.py + ALFI_TPU_LEVEL_APPLY).  Started by a
# waiter once the main round-2 queue (run_queue_r2.sh) exits, so the
# two never contend for the tunnel's compile slots.
set -x
cd /root/repo
mkdir -p results/logs
LOGS=/root/repo/results/logs
SNAP=/root/repo/scripts/launch_snapshot.sh

wait_tpu() {
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
  local name="$1" tmo="$2" log="$3"; shift 3
  for attempt in 1 2; do
    wait_tpu || return 1
    echo "=== stage $name attempt $attempt $(date -u +%H:%M:%S)" >> "$log"
    if timeout "$tmo" "$SNAP" "$name" "$@" >> "$log" 2>&1; then
      return 0
    fi
  done
  return 0
}

# T0. layout-padding tax microbench (motivates the transposed paths)
stage t0 7200 $LOGS/layout_microbench.log \
  python scripts/layout_microbench.py

# T1. bench with patch-minor XLA apply + cell-minor level matvecs
stage t1 7200 $LOGS/bench_f32t_levelt.log \
  env ALFI_TPU_PATCH_APPLY=f32t ALFI_TPU_LEVEL_APPLY=t \
  python bench.py

# T2. same with the fused Pallas patch kernel
stage t2 7200 $LOGS/bench_f32p_levelt.log \
  env ALFI_TPU_PATCH_APPLY=f32p ALFI_TPU_LEVEL_APPLY=t \
  python bench.py

# T3. control: unchanged default bench from the same snapshot
stage t3 7200 $LOGS/bench_default_control.log \
  python bench.py

# T4. bf16-stored patch inverses (half the dominant stream);
#     iteration counts in "extra" are the acceptance gate
stage t4 7200 $LOGS/bench_bf16t_levelt.log \
  env ALFI_TPU_PATCH_APPLY=bf16t ALFI_TPU_LEVEL_APPLY=t \
  python bench.py

echo QUEUE_R2B_DONE
