#!/bin/bash
# Round-4 continuation queue: the measurements the previous session's
# tunnel cut. Priority order — each answers one shipping decision:
#   1-3. full-unet x-fold A/B at prod (decides tpu_brick_fold_max_c;
#        per-level fold already measured wins at C16/C32, ~tie at C48)
#   4.   does B=2 training fit with the lane-padding tax removed?
#   5.   B=1 fold train step time
#   6.   scan-amortized sort bench (r4g measured only the dispatch floor)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

echo "=== R4K start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 120
done
echo "=== R4K tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

PROD="--points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet"
run 2400 python tools/compile_bisect.py $PROD --brick_fold 64
run 2400 python tools/compile_bisect.py $PROD --brick_fold 32
run 2400 python tools/compile_bisect.py $PROD --brick_fold 64 --bf16
run 4800 python tools/train_bench.py --steps 3 --batch_size 2 --brick_fold 64
run 4800 python tools/train_bench.py --steps 4 --brick_fold 64
run 2400 python tools/sort_bench.py --reps 5

echo "=== SUITE R4K DONE [$(date +%H:%M:%S)]" >> "$LOG"
