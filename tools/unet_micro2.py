#!/usr/bin/env python
"""U-Net op micro-bench v2: inputs as jit args, no DCE escape hatches."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, f, *args):
    fj = jax.jit(f)
    jax.block_until_ready(fj(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fj(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {np.median(ts) * 1000:9.2f} ms", flush=True)


def main():
    from geoformer_tpu.ops.sparse_conv import build_grid_plan, voxel_capacities
    from geoformer_tpu.ops.voxelize import voxelize
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    print(f"device={jax.devices()[0]}", flush=True)
    cfg = load_config(None, batch_size=1, tpu_max_points=65536, tpu_max_voxels=65536,
                      tpu_spatial_shape=512, tpu_unet_depth=7)
    batch = _synthetic_batch(cfg, 1, seed=0)
    caps = voxel_capacities(65536, 7, 0.5)
    coords, pmask = batch["coords"], batch["point_mask"]

    # full grid plan, all outputs returned (no DCE)
    def plan_full(c, m):
        plan = build_grid_plan(c, m, 512, 7, caps)
        return jax.tree.leaves(plan)

    bench("build_grid_plan (all levels)", plan_full, coords, pmask)

    def vox_only(c, m):
        g = voxelize(c, m, 65536, 512)
        return jax.tree.leaves(g)

    bench("voxelize L0", vox_only, coords, pmask)

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**30, 65536).astype(np.int32))
    bench("argsort 65k", lambda k: jnp.argsort(k), key)
    sorted_key = jnp.sort(key)
    queries = jnp.asarray(rng.integers(0, 2**30, (65536, 27)).astype(np.int32))
    bench("searchsorted 65kx27 in 65k", lambda s, q: jnp.searchsorted(s, q), sorted_key, queries)

    feats16 = jnp.asarray(rng.normal(size=(65536, 16)).astype(np.float32))
    idx1 = jnp.asarray(rng.integers(0, 65536, 65536).astype(np.int32))
    bench("row gather 65k x 16f", lambda f, i: f[i], feats16, idx1)
    idx27 = jnp.asarray(rng.integers(0, 65536, (65536, 27)).astype(np.int32))
    bench("row gather 65kx27 x 16f", lambda f, i: f[i], feats16, idx27)
    feats256 = jnp.asarray(rng.normal(size=(65536, 256)).astype(np.float32))
    bench("row gather 65k x 256f", lambda f, i: f[i], feats256, idx1)
    bench("cumsum 65k x 16f", lambda f: jnp.cumsum(f, axis=0), feats16)


if __name__ == "__main__":
    main()
