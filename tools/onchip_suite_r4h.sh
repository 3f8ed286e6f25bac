#!/bin/bash
# Round-4 follow-up queue #4: x-folded brick residency A/B (the fold
# eliminates the 8x lane-padding on narrow levels; per-level + full-unet
# at prod scale, both dtypes). Chained after the r4g suite.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4g.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4g.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4H start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4H tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

# per-level fold vs xla (bf16 = the shipped residency dtype, then f32)
run 3600 python tools/brick_kernel_bench.py --reps 8 --bf16 --fold
run 3600 python tools/brick_kernel_bench.py --reps 8 --fold
# full unet stage at prod: fold 64 vs off, bf16 and f32
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_fold 64 --bf16
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_fold 64
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_fold 128 --bf16

echo "=== SUITE R4H DONE [$(date +%H:%M:%S)]" >> "$LOG"
