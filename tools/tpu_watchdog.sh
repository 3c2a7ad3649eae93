#!/bin/bash
# Probe the axon TPU tunnel; whenever it answers, (re)run the re-entrant
# bench queue ($1, default tools/run_bench_r4.sh). The queue skips stages
# already stamped done, so a tunnel flap mid-queue only costs the interrupted
# stage. Stops once the queue reports every stage settled (done or given up).
cd /root/repo || exit 1
QUEUE=${1:-tools/run_bench_r4.sh}
while true; do
  if timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; assert (np.asarray(jnp.arange(4)+1)==[1,2,3,4]).all()" >/dev/null 2>&1; then
    echo "TPU up at $(date) — running bench queue"
    if bash "$QUEUE"; then
      echo "bench queue complete at $(date)"
      break
    fi
    echo "bench queue incomplete at $(date) — retrying while TPU answers"
    sleep 60
  else
    echo "TPU still down at $(date)"
    sleep 120
  fi
done
