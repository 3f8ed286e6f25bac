#!/bin/bash
# Round-4 consolidated on-chip queue (replaces the tunnel-cut r4b tail +
# r4c): WAITS for the tunnel to recover, then runs the remaining
# measurements in decision-value order so a short window still yields the
# kernel/cellwin/fps decisions. Run with the axon plugin ON (default env).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}
runenv() {  # runenv TIMEOUT VAR=VAL CMD...
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" env "$2" "${@:3}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# ---- wait for the tunnel (probe every 5 min; a dead tunnel makes
# jax.devices() hang, so bound each probe)
echo "=== R4D waiting for tunnel [$(date +%H:%M:%S)]" >> "$LOG"
while true; do
  if timeout 150 python -c "import jax; d = jax.devices(); assert 'TPU' in str(d[0]); import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 300
done
echo "=== R4D tunnel up [$(date +%H:%M:%S)]" >> "$LOG"

# (1) banded Pallas brick conv: per-level A/B at prod shapes (the kernel
# decision), f32 + bf16
run 3600 python tools/brick_kernel_bench.py --reps 8
run 3600 python tools/brick_kernel_bench.py --reps 8 --bf16

# (2) Pallas FPS through the tunnel: exactness + timing (gate decision)
runenv 2400 GEOFORMER_FPS_PALLAS=1 python tools/fps_onchip_check.py

# (3) per-cell window materialization A/B at shipped knn params
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --stages knn_sorted,knn_cellwin

# (4) prod-scale train step + episodic FS step (VERDICT r3 #5)
run 3600 python tools/train_bench.py --steps 4
run 3600 python tools/train_bench.py --steps 4 --fs
run 3600 python tools/train_bench.py --steps 3 --batch_size 2

# (5) full unet stage with the kernel on vs off (prod scale)
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_pallas 1
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --brick_pallas 0

# (6) geodesic-leg attribution at the shipped defaults + coarse-eps A/B
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --stages knn_parts,contract,coarse,fine,hier
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --coarse_eps 0.002 --stages coarse,hier
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --cell_div 2 --fine_sweeps 4 --coarse_eps 0.01 --stages coarse,hier

# (7) full forward with the kernel on (prod): end-to-end effect
run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages full --brick_pallas 1

# (8) compile attribution at prod (3 reps for medians; tunnel compile noise)
for i in 1 2 3; do
  run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages vox0,voxchain,brickplans,gridplan,unet,full
done

echo "=== SUITE R4D DONE [$(date +%H:%M:%S)]" >> "$LOG"
