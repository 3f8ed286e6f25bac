#!/bin/bash
# Round-4 continuation queue #3: (a) run-compressed 27-window lookup A/B
# at prod fg (one ranked_lookup per (dz,dy) row instead of 27 — CPU
# measured 12.0 vs 46.7 ms, exact); (b) decoder-stage attribution (the
# ~90 ms full-minus-geodesic tail was never split). Chained after r4l.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4l.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4l.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4M start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 120
done
echo "=== R4M tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

# model-true graph params (k=16 narrowed, cap 24, cell_div 2)
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_parts,knn,hier
# decoder vs mask-head tail split at prod
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages geodesic,decoder,full

echo "=== SUITE R4M DONE [$(date +%H:%M:%S)]" >> "$LOG"
