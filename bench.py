#!/usr/bin/env python
"""Benchmark: per-scene inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "scene_inference", "value": <scenes/sec/chip>, "unit":
   "scenes/sec", "vs_baseline": <ratio>, ...}

The workload mirrors the fully-supervised eval config (test.py, bs=1):
synthetic ScanNet-scale scene (dense room-like cloud), full pipeline
voxelize -> U-Net -> aggregator -> kNN+geodesic -> decoder -> dynamic conv
-> proposals. `vs_baseline` is measured against REFERENCE_SCENES_PER_SEC,
an estimate of the PyTorch reference's per-scene rate on its GPU (the repo
publishes no numbers — see BASELINE.md); update it when a measured
baseline exists.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 2.5  # estimated reference per-scene rate (BASELINE.md TBD)


def main():
    import jax

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    # production-shaped eval scene (bounded for one chip)
    cfg = load_config(
        None,
        batch_size=1,
        n_decode_point=2048,
        n_query_points=256,
        n_downsampling=50000,
        tpu_max_points=65536,
        tpu_max_voxels=65536,
        tpu_max_fg_points=32768,
        tpu_max_instances=64,
        tpu_knn_neighbors=64,
        tpu_geodesic_steps_eval=128,
        tpu_spatial_shape=512,
        tpu_unet_depth=7,
        tpu_ball_nsample=64,
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    batch = _synthetic_batch(cfg, 1, seed=0)

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = model.init({"params": k1, "sample": k2, "dropout": k3}, batch, train=False)

    @jax.jit
    def fwd(batch, rng):
        out = model.apply(variables, batch, train=False, rngs={"sample": rng})
        return out["proposals"]["scores"], out["semantic_scores"]

    # compile + warmup
    r = jax.random.PRNGKey(1)
    jax.block_until_ready(fwd(batch, r))

    times = []
    for i in range(8):
        r, sub = jax.random.split(r)
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(batch, sub))
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    scenes_per_sec = 1.0 / p50
    print(
        json.dumps(
            {
                "metric": "scene_inference",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/sec",
                "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 4),
                "p50_latency_s": round(p50, 4),
                "points": int(cfg.tpu_max_points),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
