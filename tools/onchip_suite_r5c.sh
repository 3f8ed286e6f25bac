#!/bin/bash
# Round-5 suite C (run after r5b): validate + measure the r5 second wave.
#   1. knn_parts: the merged-gather fix (f32 VALUE-encoded indices — the
#      bitcast form flushed to denormal-zero on chip, r5b) MUST show
#      merged-vs-split mismatches = 0 on chip; plus knn_ab now includes
#      select=pallas (VMEM k-extraction kernel vs the 91 ms top_k).
#   2. brick fold/parts at the row-map halo (vs r4k: 8.00/7.13/6.21
#      ms/conv) and the full unet stage at prod.
#   3. prod compile_bisect at the new defaults (fine_sweeps=2, fixed
#      gather) + bench prod A/B select=topk vs pallas.
#   4. batched inference scaling B=1/2/4 at full scale (VERDICT r4 #8).
#   5. the two rc-124 fold train A/Bs at timeouts sized to the measured
#      0-20 min remote-compile queue noise, + an accum=16 row.
# Same wait_tunnel / hard end-by / CPU-fallback re-queue hygiene as r5a/b.
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

echo "=== R5C start [$(date +%H:%M:%S)] end-by $(date -d @"$END_BY" +%H:%M:%S)" >> "$LOG"

# 1. merged-gather fix canary + pallas-select A/B (model-true prod params)
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 2 --stages knn_parts,knn_ab,fine,hier
# 2. brick conv at the row-map halo
run 2400 python tools/brick_kernel_bench.py --reps 8 --bf16 --fold
run 2400 python tools/brick_kernel_bench.py --reps 8 --bf16 --parts
# 3. prod stage attribution at the new defaults + headline A/B
run 2400 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --depth 7 --contexts 2048 --queries 256 --knn 64 --downsampling 50000 --spatial 1024 --brick_occupancy 64 --bf16 --stages gridplan,unet,aggregator,geodesic,decoder,full
run 2400 python bench.py --scale prod
run 2400 python bench.py --scale prod --select pallas
# 4. batched inference scaling (full scale; per-scene value in the JSON;
#    the B=1 full row comes from the r5b headline bench — same defaults)
run 2400 python bench.py --scale full --batch 2
run 2400 python bench.py --scale full --batch 4
# 5. training: the two fold A/Bs (timeouts sized to the 0-20 min compile
#    noise) + the reference-effective-batch accumulation row
run 4800 python tools/train_bench.py --batch_size 1 --steps 3 --brick_fold 32
run 4800 python tools/train_bench.py --batch_size 2 --steps 3 --brick_fold 32
run 4800 python tools/train_bench.py --batch_size 1 --steps 3 --accum 16

echo "=== SUITE R5C DONE [$(date +%H:%M:%S)]" >> "$LOG"
