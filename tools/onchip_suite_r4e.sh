#!/bin/bash
# Round-4 follow-up queue: prod-scale TRAIN memory + throughput with the
# shipped memory config (tpu_remat=true, bf16 residency — the no-remat f32
# step measured 21.2-21.3 GB vs the chip's 15.75 GB, ONCHIP_SUITE_r4.log).
# Chained after the r4d suite: waits for its pid file / DONE line, then for
# the tunnel. Run with the axon plugin ON (default env).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# wait for r4d to finish (poll its pid; it writes SUITE R4D DONE at exit)
if [ -f /tmp/suite_r4d.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4d.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4E start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4E tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

# (0) the Mosaic-legal rewrite of the banded kernel: per-level A/B (the
# r4d run died on illegal block shapes before measuring anything)
run 3600 python tools/brick_kernel_bench.py --reps 8 --bf16
run 3600 python tools/brick_kernel_bench.py --reps 8
# (0b) full unet stage with the kernel on (prod scale, bf16 residency)
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_pallas 1 --bf16
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_pallas 0 --bf16

# (1) supervised prod train step, shipped memory config (remat + bf16)
run 4800 python tools/train_bench.py --steps 4
# (2) episodic FS train step, same config
run 4800 python tools/train_bench.py --steps 4 --fs
# (3) does B=2 fit one chip?
run 4800 python tools/train_bench.py --steps 3 --batch_size 2
# (4) geodesic-leg attribution at shipped defaults (r4d run OOM'd in the
# since-fixed knn_parts tool stage)
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_parts,contract,coarse,fine,hier

echo "=== SUITE R4E DONE [$(date +%H:%M:%S)]" >> "$LOG"
