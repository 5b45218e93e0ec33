#!/bin/bash
# Poll for the axon TPU backend; when it initialises, run the round-2
# measurement queue (serialized, single client). Safe to re-run.
cd /root/repo
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
      >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU back — starting queue" >> /tmp/tpu_watch.log
    bash scripts/run_queue_r2.sh >> /tmp/tpu_watch.log 2>&1
    echo "$(date -u +%H:%M:%S) queue finished" >> /tmp/tpu_watch.log
    break
  fi
  echo "$(date -u +%H:%M:%S) TPU still down" >> /tmp/tpu_watch.log
  sleep 240
done
