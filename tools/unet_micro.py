#!/usr/bin/env python
"""Micro-benchmark the U-Net's constituent ops at production shapes."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {np.median(ts) * 1000:9.2f} ms", flush=True)
    return out


def main():
    from geoformer_tpu.ops.sparse_conv import (
        build_grid_plan, subm_conv, voxel_capacities, down_conv, up_conv,
    )
    from geoformer_tpu.ops.voxelize import devoxelize, voxel_mean_pool
    from geoformer_tpu.models.unet import SparseUNetBackbone
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    print(f"device={jax.devices()[0]}", flush=True)
    cfg = load_config(None, batch_size=1, tpu_max_points=65536, tpu_max_voxels=65536,
                      tpu_spatial_shape=512, tpu_unet_depth=7)
    batch = _synthetic_batch(cfg, 1, seed=0)
    caps = voxel_capacities(65536, 7, 0.5)
    plan = jax.jit(
        lambda c, m: build_grid_plan(c, m, 512, 7, caps)
    )(batch["coords"], batch["point_mask"])
    jax.block_until_ready(plan.grids[0].p2v)

    rng = np.random.default_rng(0)
    v0 = 65536
    for cin, cout, lvl in ((16, 16, 0), (32, 32, 1), (48, 48, 2)):
        vl = caps[lvl]
        feats = jnp.asarray(rng.normal(size=(1, vl, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
        bench(f"subm_conv V={vl} C={cin}", lambda f, n, w: subm_conv(f, n, w),
              feats, plan.subm[lvl], w)
        bench(f"subm_conv bf16 V={vl} C={cin}",
              lambda f, n, w: subm_conv(f, n, w, compute_dtype=jnp.bfloat16),
              feats, plan.subm[lvl], w)

    feats6 = jnp.asarray(rng.normal(size=(1, 65536, 6)).astype(np.float32))
    bench("voxel_mean_pool", lambda f: voxel_mean_pool(f, plan.grids[0]), feats6)
    featsm = jnp.asarray(rng.normal(size=(1, v0, 16)).astype(np.float32))
    bench("devoxelize", lambda f: devoxelize(f, plan.grids[0]), featsm)
    wd = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))
    bench("down_conv L0", lambda f, w: down_conv(f, plan.links[0], w), featsm, wd)
    wu = jnp.asarray(rng.normal(size=(8, 32, 16)).astype(np.float32))
    featsp = jnp.asarray(rng.normal(size=(1, caps[1], 32)).astype(np.float32))
    bench("up_conv L0", lambda f, w: up_conv(f, plan.links[0], w), featsp, wu)

    # full backbone for reference
    mcfg = dict(m=16, classes=13, depth=7)
    model = SparseUNetBackbone(**mcfg)
    feats_in = jnp.asarray(rng.normal(size=(1, v0, 6)).astype(np.float32))
    variables = jax.jit(
        lambda r, f: model.init(r, f, plan, False)
    )(jax.random.PRNGKey(0), feats_in)
    bench("full unet", lambda f: model.apply(variables, f, plan, False), feats_in)


if __name__ == "__main__":
    main()
