#!/bin/bash
# CPU-side iteration-table producer. Robustness tables (Krylov counts)
# are platform-independent, so when the TPU tunnel is down these sweeps
# still produce the papers' headline evidence; wall-clock comes from
# the TPU queue (run_queue_r2c.sh) when the tunnel returns.  Serial:
# one sweep at a time on the single host core.  Each sweep checkpoints,
# so a retry resumes.
set -x
cd /root/repo
LOGS=/root/repo/results/logs

# wait for the directly-launched SV nref=2 sweep to finish (it appends
# EXIT= on completion), then take the single-core lock
SVLOG=$LOGS/sv_ldc2d_k2_nref2_re10000_cpu.log
while [ -f "$SVLOG" ] && ! grep -q "^EXIT=" "$SVLOG"; do
  sleep 120
done
LOCK=/tmp/cpu_sweep.lock
while [ -f "$LOCK" ] && kill -0 "$(cat $LOCK)" 2>/dev/null; do
  sleep 120
done
echo $$ > "$LOCK"

sweep() {
  local log="$1"; shift
  [ -f "$LOGS/.done_cpu_$(basename $log .log)" ] && return 0
  if timeout 25000 python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys
sys.argv = ['iters.py'] + '''$*'''.split()
import runpy; runpy.run_path('examples/iters.py', run_name='__main__')
" >> "$log" 2>&1; then
    touch "$LOGS/.done_cpu_$(basename $log .log)"
  fi
}

# 1. north star robustness: ldc3d [P2+FB]^3-P0 SUPG, Re->5000
sweep $LOGS/ldc3d_p2fb_nref1_re5000_cpu.log \
  --checkpoint --problem ldc3d --nref-start 1 --nref-end 1 --baseN 4 \
  --k 2 --solver-type almg --discretisation pkp0 --mh uniform \
  --stabilisation-type supg --patch star --smoothing 10 --restriction \
  --re-max 5000

# 2. 2D pkp0 nref=3 robustness row, Re->10000
sweep $LOGS/iters_ldc2d_nref3_re10000_cpu.log \
  --checkpoint --problem ldc2d --nref-start 3 --nref-end 3 --baseN 16 \
  --k 2 --solver-type almg --discretisation pkp0 --mh uniform \
  --stabilisation-type supg --patch star --restriction --re-max 10000

# 3. [P1+FB]^3 BubbleTransfer end-to-end, Re->1000
sweep $LOGS/ldc3d_p1fb_nref1_re1000_cpu.log \
  --checkpoint --problem ldc3d --nref-start 1 --nref-end 1 --baseN 4 \
  --k 1 --solver-type almg --discretisation pkp0 --mh uniform \
  --stabilisation-type supg --stabilisation-weight 0.05 --patch star \
  --smoothing 10 --restriction --re-max 1000

rm -f "$LOCK"
echo CPU_TABLES_DONE
