#!/bin/bash
# Round-4 follow-up queue #5: x-fold end-to-end effects — full-model
# forward at prod with fold on, and the training memory/step-time story
# (does B=2 fit with the padding tax removed?). Chained after r4h.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4h.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4h.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4I start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4I tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

# full model forward at prod, fold on vs off (bf16 is not the eval default;
# eval runs f32 levels unless tpu_bf16)
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages full --brick_fold 64
# supervised train step with fold (B=1 step time + compiled temp)
run 4800 python tools/train_bench.py --steps 4 --brick_fold 64
# does B=2 fit with the padding tax removed?
run 4800 python tools/train_bench.py --steps 3 --batch_size 2 --brick_fold 64

echo "=== SUITE R4I DONE [$(date +%H:%M:%S)]" >> "$LOG"
