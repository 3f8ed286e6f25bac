#!/bin/bash
# Queued on-chip A/B suite (BASELINE.md "Round 3: pending on-chip A/Bs").
# Run with the axon plugin ON (default env). Appends everything to
# /tmp/onchip_suite.log; each step bounded so one hang doesn't eat the session.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_r3.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# (1) geodesic-leg attribution at prod fg
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --stages knn_sorted,knn_compact,contract,coarse,fine,hier
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --stages hier --fine_sweeps 4
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --stages hier --fine_sweeps 2
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --stages hier --k_sub 8

# (2) aggregator: voxel-hash ball query vs brute force (prod shapes)
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages aggregator
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages aggregator --ball_cell_cap 32

# (3) banded vs plain brick convs
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --banded

# (4) bench at shipped defaults + prod
run 2400 python bench.py
run 2400 python bench.py --scale prod

# (5) train step at prod scale
run 2400 python tools/train_bench.py --steps 4

echo "=== SUITE DONE [$(date +%H:%M:%S)]" >> "$LOG"
