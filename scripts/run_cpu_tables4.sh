#!/bin/bash
# Fourth CPU table chain: the remaining short experiment surfaces that
# are platform-independent (iteration counts / convergence orders):
# dfg benchmark sweep + MMS convergence-order tables.  Runs at nice 19
# so the TPU measurement queue keeps host priority (1-core host).
set -x
cd /root/repo
LOGS=/root/repo/results/logs
mkdir -p $LOGS

run() {
  local log="$1" path="$2"; shift 2
  [ -f "$LOGS/.done_cpu_$(basename $log .log)" ] && return 0
  if timeout 25000 nice -n 19 python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys
sys.argv = ['$(basename $path)'] + '''$*'''.split()
import runpy; runpy.run_path('$path', run_name='__main__')
" >> "$log" 2>&1; then
    touch "$LOGS/.done_cpu_$(basename $log .log)"
  fi
}

# dfg cylinder benchmark sweep (reference examples/dfg/dfg.py res)
run $LOGS/dfg_pkp0_nref1.log examples/dfg.py \
  --nref 1 --k 2 --solver-type almg --discretisation pkp0 \
  --mh uniform --stabilisation-type supg --patch star --smoothing 6 \
  --restriction

# MMS convergence orders, 2D SV (reference Makefile mms target)
run $LOGS/mms2d_sv_nref3.log examples/mms.py \
  --dim 2 --discretisation sv --mh bary --k 2 --nref 3 --baseN 8 \
  --solver-type almg --patch macro --smoothing 6 --restriction

# MMS convergence orders, 2D pkp0
run $LOGS/mms2d_pkp0_nref3.log examples/mms.py \
  --dim 2 --discretisation pkp0 --mh uniform --k 2 --nref 3 --baseN 8 \
  --solver-type almg --patch star --smoothing 6 --restriction

echo CPU_TABLES4_DONE
