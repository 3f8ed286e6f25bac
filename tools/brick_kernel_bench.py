#!/usr/bin/env python
"""Per-level brick conv microbenchmark at prod backbone shapes.

Times dense_subm_conv (halo pad + conv), amortized in a scan inside one
jit (every timing D2H-observed; the tunnel's block_until_ready is a
no-op). Shapes mirror the prod backbone levels: NB bricks at the level's
channel width. This tool A/B'd the banded Pallas brick kernel in r4: the
kernel measured 2-2.5x SLOWER than XLA at every width (both dtypes,
ONCHIP_SUITE_r4.log suite r4e) and was deleted — see DESIGN.md.

Usage: python tools/brick_kernel_bench.py [--reps 8] [--bf16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_level(nb, cin, cout, occupancy, reps, compute_dtype, fold=False):
    from geoformer_tpu.ops.brick import (BS, build_brick_plan, dense_subm_conv,
                                         dense_subm_conv_folded, fold_x)
    from geoformer_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(0)
    # synthetic surface-ish occupancy: `occupancy` voxels per brick
    v = nb * occupancy
    bricks = rng.permutation(nb * 2)[:nb]  # occupied brick ids in a 2x keyspace
    cells = rng.permutation(BS**3)[:occupancy]
    bx = np.stack(np.unravel_index(bricks, (16, 16, nb * 2 // 256 + 1)), -1)
    cx = np.stack(np.unravel_index(cells, (BS, BS, BS)), -1)
    coords = (bx[:, None, :] * BS + cx[None, :, :]).reshape(-1, 3)[:v]
    coords = jnp.asarray(coords[None], jnp.int32)  # [1, V, 3]
    mask = jnp.ones((1, v), bool)

    spatial = 1024
    grid = voxelize(coords, mask, v, spatial)
    plan = build_brick_plan(grid, spatial, nb)
    dtype = compute_dtype or jnp.float32
    x = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)

    # plan passed as a TRACED argument: closure-captured plan arrays embed
    # as program constants, which the r4d run showed distorting the XLA
    # baseline ~300x vs the same conv inside compile_bisect's unet stage
    if fold:
        assert cin == cout, "fold bench rows keep the carry segs uniform"
        x = fold_x(x)

    def conv(c, w, plan):
        if fold:
            return dense_subm_conv_folded(c, plan, w, (cin,),
                                          compute_dtype=compute_dtype)
        return dense_subm_conv(c, plan, w, compute_dtype=compute_dtype)

    @jax.jit
    def run(x, w, plan):
        def body(c, _):
            y = conv(c, plan=plan, w=w)
            if cout != cin:  # keep the scan carry shape (tile channels back)
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
            return y.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=reps)
        # scalar output: D2H through the tunnel relay runs ~MB/s — returning
        # the full level tensor measured 3 s of pure transfer per call
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def run_one(x, w, plan):
        y = conv(x, plan=plan, w=w)
        return jnp.sum(y.astype(jnp.float32))

    t0 = time.perf_counter()
    out = float(run(x, w, plan))  # D2H forces completion
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, w, plan))
        times.append(time.perf_counter() - t0)
    per_conv = float(np.median(times)) / reps * 1e3
    # unamortized cross-check (catches scan-harness artifacts): one conv,
    # D2H per call — includes the tunnel dispatch floor
    float(run_one(x, w, plan))
    times1 = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_one(x, w, plan))
        times1.append(time.perf_counter() - t0)
    one_ms = float(np.median(times1)) * 1e3
    assert np.isfinite(out)
    return per_conv, one_ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--occupancy", type=int, default=64)
    ap.add_argument("--fold", action="store_true",
                    help="x-folded layout + banded 2D conv (skips C-change rows)")
    args = ap.parse_args()
    cd = jnp.bfloat16 if args.bf16 else None
    print(f"device={jax.devices()[0]} reps={args.reps} "
          f"dtype={'bf16' if args.bf16 else 'f32'}")
    # prod backbone levels: (NB, C) — level tails run 2C -> C
    for nb, cin, cout in [(4096, 16, 16), (4096, 32, 16), (2048, 32, 32),
                          (1024, 48, 48), (512, 64, 64)]:
        if args.fold and cin != cout:
            continue
        per_conv, one_ms, compile_s = bench_level(
            nb, cin, cout, args.occupancy, args.reps, cd, fold=args.fold
        )
        tag = "fold" if args.fold else "xla "
        print(f"NB={nb:5d} C={cin:3d}->{cout:3d} {tag}: "
              f"{per_conv:7.2f} ms/conv (1-shot {one_ms:.1f} ms, "
              f"compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
