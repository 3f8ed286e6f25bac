#!/bin/bash
# Round-4 final queue: everything the earlier session cuts left unmeasured,
# priority-ordered (each item closes one open BASELINE.md question):
#   1-2. headline bench at the FINAL shipped defaults (x-fold landed after
#        the last headline run) — full + prod
#   3.   does B=2 training fit with the lane-padding tax removed? (r4k cut
#        mid-run; the pre-fold B=2 OOM dump blamed 8x lane padding)
#   4.   B=1 fold train step time (vs 1553.9 ms pre-fold)
#   5.   decoder/mask-head tail attribution (the ~90 ms full-minus-geodesic
#        tail was never split)
#   6.   run-compressed window_lookup on-chip confirm (CPU 12.0 vs 46.7 ms)
#   7.   scan-amortized sort bench (r4g measured only the dispatch floor)
# The tunnel drops for hours at a time, so EVERY run waits for it first
# (the r4k/r4l/r4m queues only waited at suite start and burned their
# timeouts when the tunnel died mid-suite).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
wait_tunnel() {
  while true; do
    if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
      return
    fi
    sleep 120
  done
}
run() {
  wait_tunnel
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

echo "=== R4N start [$(date +%H:%M:%S)]" >> "$LOG"

run 2400 python bench.py
run 2400 python bench.py --scale prod
run 3000 python tools/train_bench.py --steps 3 --batch_size 2 --brick_fold 32
run 3000 python tools/train_bench.py --steps 4 --brick_fold 32
run 2400 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages geodesic,decoder,full
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_parts,knn
run 1800 python tools/sort_bench.py --reps 5

echo "=== SUITE R4N DONE [$(date +%H:%M:%S)]" >> "$LOG"
