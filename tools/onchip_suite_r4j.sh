#!/bin/bash
# Round-4 follow-up queue #6: scan-amortized sort microbench (the r4g run
# (sorts are load-bearing: gridplan voxel keys, radius-cell table build,
# measured only the ~30ms tunnel dispatch floor at every size).
# geodesic contraction edges — sizes a possible Pallas sort kernel).
# Chained after the r4f suite.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4f.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4f.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4J start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4J tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

run 2400 python tools/sort_bench.py --reps 5

echo "=== SUITE R4J DONE [$(date +%H:%M:%S)]" >> "$LOG"
