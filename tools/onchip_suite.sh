#!/bin/bash
# Unattended on-chip measurement suite. Run with the axon plugin ON
# (default env). Appends everything to the log named below (override with
# ONCHIP_SUITE_LOG or pass a round tag as $1); each step is bounded so one
# hang doesn't eat the session.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
TAG=${1:-$(date +%Y%m%d)}
LOG=${ONCHIP_SUITE_LOG:-/root/repo/ONCHIP_SUITE_${TAG}.log}
run() {
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# (1) radius-kNN window compaction A/B at prod fg (r4 rewrite)
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 16 --stages knn_sorted,knn_window --window 64
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 16 --stages knn_window --window 128
run 1200 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 8 --stages knn_window --window 64

# (2) full geodesic leg at the new defaults
run 1800 python tools/geo_bisect.py --fg 131072 --queries 256 --knn 16 --cell_cap 16 --fine_sweeps 4 --stages hier

# (3) unet at prod (bf16-resident brick chain A/B)
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet
run 1800 python tools/compile_bisect.py --points 250000 --voxels 262144 --fg 131072 --spatial 1024 --brick_occupancy 64 --stages unet --bf16

# (4) bench at shipped defaults + prod
run 2400 python bench.py
run 3200 python bench.py --scale prod

# (5) train step at prod scale + episodic FS step
run 3000 python tools/train_bench.py --steps 4
run 3000 python tools/train_bench.py --steps 4 --fs

echo "=== SUITE DONE [$(date +%H:%M:%S)]" >> "$LOG"
