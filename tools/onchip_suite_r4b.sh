#!/bin/bash
# Round-4 second on-chip queue: clean cap-24 bench, batched-throughput A/B,
# prod/FS train steps, shipped-knn attribution, compile attribution reps.
# Run with the axon plugin ON (default env). Appends to ONCHIP_SUITE_r4.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r4.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# (1) headline bench at the shipped cap=24 defaults (expect dropped_points 0)
run 2400 python bench.py
run 3600 python bench.py --scale prod

# (2) batched-throughput A/B: the pipeline is overhead-bound per op, so
# B > 1 should amortize the fixed costs (sorts/table builds/gathers)
run 4800 python bench.py --scale full --batch 2
run 6400 python bench.py --scale full --batch 4
run 6400 python bench.py --scale prod --batch 2
run 8000 python bench.py --scale prod --batch 4

# (3) prod-scale train step + episodic FS step (VERDICT r3 #5)
run 3600 python tools/train_bench.py --steps 4
run 3600 python tools/train_bench.py --steps 4 --fs
run 3600 python tools/train_bench.py --steps 3 --batch_size 2

# (4) geodesic-leg attribution at the shipped defaults (cap=24, sweeps=4)
run 2400 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --fine_sweeps 4 --stages knn_sorted,knn_parts,contract,coarse,fine,hier
# coarse-eps A/B: sweeps-to-fixpoint + hier total at 2mm / 1cm exit slack
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --fine_sweeps 4 --coarse_eps 0.002 --stages coarse,hier
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 24 --fine_sweeps 4 --coarse_eps 0.01 --stages coarse,hier

# (5) compile attribution at prod (3 reps for medians; tunnel compile noise)
for i in 1 2 3; do
  run 3600 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages vox0,voxchain,brickplans,gridplan,unet,full
done

echo "=== SUITE R4B DONE [$(date +%H:%M:%S)]" >> "$LOG"
