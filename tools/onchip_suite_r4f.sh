#!/bin/bash
# Round-4 follow-up queue #2: fine-sweep block-size A/B (the hier solve's
# fine stage is latency-bound — 256 blocks x fwd+bwd x sweeps sequential
# dispatches at block 512; AP holds at 2048/4096 on the walled scene,
# tests/test_geodesic_ap_delta.py::test_hier_fine_block_ap_within_bound).
# Chained after the r4e suite.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4e.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4e.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4F start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4F tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

for fb in 512 2048 4096; do
  run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --fine_block "$fb" --stages fine,hier
done

echo "=== SUITE R4F DONE [$(date +%H:%M:%S)]" >> "$LOG"
