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


def bench_parts(nb, c, occupancy, reps, compute_dtype):
    """Decompose the folded conv's cost: halo-pad only, conv on a
    PRE-padded buffer, 9-tap slice+dot accumulation on the same buffer,
    and the assembled op — each scan-amortized in its own jit. The full op
    measured ~13x its traffic roofline (8.0 ms at NB=4096 C16 bf16, r4k);
    this pins which half owns the gap and whether the conv emitter's
    [NB,10,10,10C] VALID lowering loses to explicit shifted matmuls."""
    from geoformer_tpu.ops.brick import (BS, _halo_pad_folded,
                                         build_banded_kernel, build_brick_plan,
                                         dense_subm_conv_folded, fold_mask,
                                         fold_x)
    from geoformer_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(0)
    v = nb * occupancy
    bricks = rng.permutation(nb * 2)[:nb]
    cells = rng.permutation(BS**3)[:occupancy]
    bx = np.stack(np.unravel_index(bricks, (16, 16, nb * 2 // 256 + 1)), -1)
    cx = np.stack(np.unravel_index(cells, (BS, BS, BS)), -1)
    coords = (bx[:, None, :] * BS + cx[None, :, :]).reshape(-1, 3)[:v]
    coords = jnp.asarray(coords[None], jnp.int32)
    mask = jnp.ones((1, v), bool)
    grid = voxelize(coords, mask, v, 1024)
    plan = build_brick_plan(grid, 1024, nb)
    dtype = compute_dtype or jnp.float32
    x = fold_x(jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, c)), dtype))
    w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.1, jnp.float32)
    segs = (c,)

    def pad_one(f, nbr):
        return _halo_pad_folded(f, nbr, segs)

    band = build_banded_kernel(w, segs)  # [3,3,10c,8c]
    if compute_dtype is not None:
        band = band.astype(compute_dtype)

    def scan_bench(body, init, label):
        @jax.jit
        def run(x0, plan):
            def step(cr, _):
                return body(cr, plan), ()
            y, _ = jax.lax.scan(step, x0, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        float(run(init, plan))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(init, plan))
            ts.append(time.perf_counter() - t0)
        print(f"NB={nb:5d} C={c:3d} {label:18s}: "
              f"{float(np.median(ts)) / reps * 1e3:7.2f} ms/iter", flush=True)

    # 1. halo pad only (output trimmed back to carry shape)
    def body_pad(cr, plan):
        p = jax.vmap(pad_one)(cr, plan.nbr)
        return p[:, :, 1:9, 1:9, c:9 * c].astype(cr.dtype)

    scan_bench(body_pad, x, "pad only")

    # 2. conv on a pre-padded buffer (pad cost excluded; carry IS padded)
    xp = jax.vmap(pad_one)(x, plan.nbr)

    def body_conv(cr, plan):
        y = jax.vmap(lambda p: jax.lax.conv_general_dilated(
            p, band, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(cr)
        # re-pad shape by edge-extending so the carry stays padded-shaped
        return jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1), (c, c))
                       ).astype(cr.dtype)

    scan_bench(body_conv, xp, "conv prepadded")

    # 3. 9-tap shifted dot accumulation on the same pre-padded buffer
    def body_dots(cr, plan):
        acc = None
        for kz in range(3):
            for ky in range(3):
                sl = cr[:, :, kz:kz + 8, ky:ky + 8, :]
                d = jax.lax.dot_general(
                    sl, band[kz, ky], (((4,), (0,)), ((), ())))
                acc = d if acc is None else acc + d
        return jnp.pad(acc, ((0, 0), (0, 0), (1, 1), (1, 1), (c, c))
                       ).astype(cr.dtype)

    scan_bench(body_dots, xp, "9-tap dots")

    # 4. the assembled production op (mask + pad + conv)
    def body_full(cr, plan):
        return dense_subm_conv_folded(cr, plan, w, segs,
                                      compute_dtype=compute_dtype
                                      ).astype(cr.dtype)

    scan_bench(body_full, x, "full folded conv")

    # 5. occupancy-mask pass alone
    def body_mask(cr, plan):
        return jnp.where(fold_mask(plan.occ, segs), cr, 0)

    scan_bench(body_mask, x, "mask pass only")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--occupancy", type=int, default=64)
    ap.add_argument("--fold", action="store_true",
                    help="x-folded layout + banded 2D conv (skips C-change rows)")
    ap.add_argument("--parts", action="store_true",
                    help="decompose the folded conv: pad / conv / dots / full")
    args = ap.parse_args()
    if args.parts:
        cd = jnp.bfloat16 if args.bf16 else None
        print(f"device={jax.devices()[0]} reps={args.reps} "
              f"dtype={'bf16' if args.bf16 else 'f32'} [parts]")
        for nb, c in [(4096, 16), (2048, 32), (1024, 48)]:
            bench_parts(nb, c, args.occupancy, args.reps, cd)
        return
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
