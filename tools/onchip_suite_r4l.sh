#!/bin/bash
# Round-4 continuation queue #2: headline refresh at the new shipped
# defaults (tpu_brick_fold_max_c=32) — full + prod bench. Chained after
# the r4k suite.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

if [ -f /tmp/suite_r4k.pid ]; then
  while kill -0 "$(cat /tmp/suite_r4k.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== R4L start [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 120
done
echo "=== R4L tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

run 3600 python bench.py
run 3600 python bench.py --scale prod

echo "=== SUITE R4L DONE [$(date +%H:%M:%S)]" >> "$LOG"
