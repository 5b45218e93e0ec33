#!/bin/bash
# Second CPU table chain: starts after run_cpu_tables.sh prints
# CPU_TABLES_DONE (serialised on the single host core).
set -x
cd /root/repo
LOGS=/root/repo/results/logs

while ! grep -q CPU_TABLES_DONE /tmp/cpu_tables.log 2>/dev/null; do
  sleep 300
done

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

# 4. bfs2d on the real reference coarse mesh (telescoped host sparse
#    coarse above the dense cap), Re->1000
sweep $LOGS/iters_bfs2d_coarse12_nref1_re1000_cpu.log \
  --checkpoint --problem bfs2d --mesh tests/fixtures/bfs2d_coarse12.msh \
  --nref-start 1 --nref-end 1 --baseN 0 --k 2 --solver-type almg \
  --discretisation pkp0 --mh uniform --stabilisation-type supg \
  --patch star --smoothing 10 --restriction --re-max 1000

# 5. SV nref=3 stretch row (268k dofs) to Re=1000 if time allows
sweep $LOGS/sv_ldc2d_k2_nref3_re1000_cpu.log \
  --checkpoint --problem ldc2d --nref-start 3 --nref-end 3 --baseN 10 \
  --k 2 --solver-type almg --discretisation sv --mh bary \
  --stabilisation-type burman --patch macro --smoothing 6 \
  --restriction --stabilisation-weight 5e-3 --re-max 1000

echo CPU_TABLES2_DONE
