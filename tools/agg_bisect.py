#!/usr/bin/env python
"""Standalone timing of the set-aggregator leg at a given scale: FPS,
ball query, grouping gather, SharedMLP+pool. Prod-scale Δ ~143 ms
(BASELINE.md r3) — this attributes it.

Usage: python tools/agg_bisect.py --points 50000 --npoint 2048 --nsample 64
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3, label=""):
    out = fn(*args)
    float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree.leaves(out)
              if hasattr(x, "dtype")))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype")))
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} run={np.median(ts) * 1000:9.1f}ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50000)
    ap.add_argument("--npoint", type=int, default=2048)
    ap.add_argument("--nsample", type=int, default=64)
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--channels", type=int, default=16)
    args = ap.parse_args()

    from geoformer_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from geoformer_tpu.ops.fps import furthest_point_sample
    from geoformer_tpu.ops.ball_query import ball_query, query_and_group

    p, k, ns = args.points, args.npoint, args.nsample
    rng = np.random.default_rng(0)
    extent = max(2.0, float(np.sqrt(p) * 0.028))
    pts = jnp.asarray(rng.uniform(0, extent, size=(1, p, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(1, p, args.channels)).astype(np.float32))
    mask = jnp.ones((1, p), bool)
    print(f"device={jax.devices()[0]} P={p} K={k} ns={ns}", flush=True)

    fps = jax.jit(functools.partial(furthest_point_sample, n_samples=k))
    inds, _ = timed(fps, pts, mask, label=f"fps {k} picks")
    centers = jnp.take_along_axis(pts, inds[..., None], axis=1)

    bq = jax.jit(functools.partial(ball_query, radius=args.radius, nsample=ns))
    idx, hit = timed(bq, centers, pts, mask, label=f"ball_query top_k@{p}")

    @jax.jit
    def group_only(pts, feats, idx, centers):
        def scene(ptss, f, i, c):
            gx = ptss[i] - c[:, None, :]
            gf = f[i]
            return gx, gf
        return jax.vmap(scene)(pts, feats, idx, centers)

    timed(group_only, pts, feats, idx, centers, label="group gather")

    qg = jax.jit(functools.partial(
        query_and_group, radius=args.radius, nsample=ns, normalize_xyz=True))
    gx, gf, idx, hit = timed(qg, centers, pts, feats, mask, label="query_and_group (all)")

    # SharedMLP + pool with throwaway params
    from geoformer_tpu.models.aggregator import SetAggregator

    agg = SetAggregator(mlp_dims=(32, 32, 32))
    grouped = jnp.concatenate([gx, gf], axis=-1)
    variables = agg.init(jax.random.PRNGKey(0), grouped, hit, False)

    @jax.jit
    def mlp(variables, grouped, hit):
        return agg.apply(variables, grouped, hit, False)

    timed(mlp, variables, grouped, hit, label="SharedMLP+maxpool")


if __name__ == "__main__":
    main()
