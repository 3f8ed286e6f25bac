#!/bin/bash
# Round-5 follow-up queue (run after r5a): quantify the r5 merged-gather
# kNN path end-to-end + per-stage, the fine_k=8 fine-sweep lever (AP-gated
# on the 4 CPU topologies first), and re-run the headline at final
# defaults. Same hard end-by + CPU-fallback re-queue hygiene as r5a.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r5.log}
END_BY=${ONCHIP_SUITE_END_BY:-$(($(date +%s) + 5 * 3600))}

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
    echo "=== SKIP (past end-by): $*" >> "$LOG"
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

echo "=== R5B start [$(date +%H:%M:%S)] end-by $(date -d @"$END_BY" +%H:%M:%S)" >> "$LOG"

# (fine_k=8 fine-sweep arm dropped: it fails the multi-room-loop AP gate
# on CPU — 0.50 vs 1.00 — so its latency win is unshippable; fine_k=16
# stays. The 4-topology gate caught what the single walled scene missed.)
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_sorted,knn_parts
run 2400 python tools/brick_kernel_bench.py --reps 8 --bf16 --parts
run 2400 python bench.py
run 2400 python bench.py --scale prod

echo "=== SUITE R5B DONE [$(date +%H:%M:%S)]" >> "$LOG"
