#!/bin/bash
# Round-5 on-chip queue, priority-ordered (each item closes one VERDICT r4
# directive):
#   1.   kNN lever A/B at model-true prod params: dense-grid lookup x
#        k-selection (topk sort / argmin passes / approx) — decides the
#        shipped select default (dense already shipped on r4n evidence)
#   2-3. headline bench full + prod at the r5 defaults (dense_grid=256)
#   4.   prod bench with select=passes (full-pipeline check of the A/B)
#   5-6. batched inference scaling B=2 / B=4 (VERDICT #8: replace the
#        single shelved B=2 data point)
#   7-8. the two rc-124 fold train A/Bs, timeouts sized to the measured
#        0-20 min remote-compile queue noise (VERDICT #3)
#   9.   gradient accumulation measured (accum=8 micro-steps)
#  10.   hier cell_factor A/B (coarse fixpoint lever)
#
# Process hygiene (VERDICT r4 "what's weak" #5): a HARD end-by deadline —
# no run starts unless its full timeout fits before END_BY, so the queue
# can never hold the chip into a driver snapshot window; and a bench run
# that fell back to CPU (tunnel race) is re-queued once instead of letting
# CPU rows sit in a TPU suite log (ADVICE r4).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r5.log}
END_BY=${ONCHIP_SUITE_END_BY:-$(($(date +%s) + 6 * 3600))}

wait_tunnel() {
  while true; do
    if [ "$(date +%s)" -ge "$END_BY" ]; then return 1; fi
    if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    sleep 120
  done
}

run() {
  local t=$1; shift
  local now=$(date +%s)
  if [ $((now + t)) -gt "$END_BY" ]; then
    echo "=== SKIP (past end-by $(date -d @"$END_BY" +%H:%M:%S)): $*" >> "$LOG"
    return
  fi
  wait_tunnel || { echo "=== SKIP (deadline while waiting for tunnel): $*" >> "$LOG"; return; }
  local tmp
  tmp=$(mktemp)
  echo "=== [$(date +%H:%M:%S)] $t $*" >> "$LOG"
  timeout "$t" "$@" > "$tmp" 2>&1
  local rc=$?
  cat "$tmp" >> "$LOG"
  echo "--- rc=$rc [$(date +%H:%M:%S)]" >> "$LOG"
  if grep -q "falling back to CPU\|CPU fallback" "$tmp"; then
    echo "=== CPU-fallback detected; re-queueing once after tunnel wait" >> "$LOG"
    rm -f "$tmp"
    now=$(date +%s)
    if [ $((now + t)) -le "$END_BY" ] && wait_tunnel; then
      echo "=== [$(date +%H:%M:%S)] RETRY $t $*" >> "$LOG"
      timeout "$t" "$@" >> "$LOG" 2>&1
      echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
    fi
    return
  fi
  rm -f "$tmp"
}

echo "=== R5A start [$(date +%H:%M:%S)] end-by $(date -d @"$END_BY" +%H:%M:%S)" >> "$LOG"

run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_ab
run 2400 python bench.py
run 2400 python bench.py --scale prod
run 2400 python bench.py --scale prod --select passes
run 5000 python bench.py --batch 2
run 5000 python bench.py --batch 4
run 4800 python tools/train_bench.py --steps 3 --batch_size 2 --brick_fold 32
run 4800 python tools/train_bench.py --steps 4 --brick_fold 32
run 4800 python tools/train_bench.py --steps 8 --accum 8
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages contract,coarse,hier
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --cell_factor 3.0 --stages contract,coarse,hier
run 2400 python tools/brick_kernel_bench.py --reps 8 --bf16 --parts

echo "=== SUITE R5A DONE [$(date +%H:%M:%S)]" >> "$LOG"
