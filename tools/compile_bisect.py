#!/usr/bin/env python
"""Stage-by-stage compile/run timing of the flagship forward at given scale.

Usage: python tools/compile_bisect.py [--points 16384] [--depth 7] ...
Times each pipeline stage's jit compile + steady-state run on the current
backend so compile blowups and runtime hotspots can be attributed.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--voxels", type=int, default=16384)
    ap.add_argument("--fg", type=int, default=8192)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--contexts", type=int, default=2048)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--knn", type=int, default=64)
    ap.add_argument("--geo_steps", type=int, default=128)
    ap.add_argument("--downsampling", type=int, default=50000)
    ap.add_argument("--spatial", type=int, default=512)
    ap.add_argument("--stages", type=str, default="all")
    ap.add_argument("--brick_occupancy", type=int, default=None,
                    help="override tpu_brick_occupancy (0 = rulebook path)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute in the conv path (fp32 accum)")
    ap.add_argument("--ball_cell_cap", type=int, default=None,
                    help="override tpu_ball_cell_cap (0 = brute force)")
    ap.add_argument("--knn_window", type=int, default=None,
                    help="override tpu_knn_window (0 = full width)")
    ap.add_argument("--radius_cell_cap", type=int, default=None,
                    help="override tpu_radius_cell_cap")
    ap.add_argument("--brick_fold", type=int, default=None,
                    help="override tpu_brick_fold_max_c (0 = off)")
    ap.add_argument("--batch", type=int, default=1,
                    help="batch size (per-stage batched-dispatch scaling: "
                         "times are per DISPATCH, divide by B for per-scene)")
    args = ap.parse_args()

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(
        None,
        batch_size=args.batch,
        n_decode_point=args.contexts,
        n_query_points=args.queries,
        n_downsampling=args.downsampling,
        tpu_max_points=args.points,
        tpu_max_voxels=args.voxels,
        tpu_max_fg_points=args.fg,
        tpu_max_instances=64,
        tpu_knn_neighbors=args.knn,
        tpu_geodesic_steps_eval=args.geo_steps,
        tpu_spatial_shape=args.spatial,
        tpu_unet_depth=args.depth,
        tpu_ball_nsample=64,
        **({} if args.brick_occupancy is None else {"tpu_brick_occupancy": args.brick_occupancy}),
        **({"tpu_bf16": True} if args.bf16 else {}),
        **({} if args.ball_cell_cap is None else {"tpu_ball_cell_cap": args.ball_cell_cap}),
        **({} if args.knn_window is None else {"tpu_knn_window": args.knn_window}),
        **({} if args.radius_cell_cap is None else {"tpu_radius_cell_cap": args.radius_cell_cap}),
        **({} if args.brick_fold is None else {"tpu_brick_fold_max_c": args.brick_fold}),
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    batch = _synthetic_batch(cfg, args.batch, seed=0)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)

    print(f"device={jax.devices()[0]} points={args.points} depth={args.depth} "
          f"batch={args.batch}")

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )({"params": k1, "sample": k2, "dropout": k3}, batch)
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    stages = {}

    def gridplan(variables, batch, rng):
        from geoformer_tpu.ops.sparse_conv import build_grid_plan, voxel_capacities

        caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
        plan = build_grid_plan(batch["coords"], batch["point_mask"], mc.spatial, mc.depth,
                               caps, brick_occupancy=mc.brick_occupancy or None)
        first = plan.bricks[0].nbr if plan.bricks else plan.subm[0]
        return first, plan.grids[0].p2v

    # gridplan compile sub-stages (compile-time attribution: the full
    # gridplan program is the top compile sink — these isolate which leg)
    def vox0(variables, batch, rng):
        from geoformer_tpu.ops.voxelize import voxelize

        return voxelize(batch["coords"], batch["point_mask"], mc.max_voxels,
                        mc.spatial).p2v

    def voxchain(variables, batch, rng):
        from geoformer_tpu.ops.sparse_conv import (
            build_downsample, voxel_capacities)
        from geoformer_tpu.ops.voxelize import voxelize

        caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
        grids = [voxelize(batch["coords"], batch["point_mask"], caps[0],
                          mc.spatial)]
        s = mc.spatial
        for lvl in range(mc.depth - 1):
            link = build_downsample(grids[-1], s, caps[lvl + 1])
            grids.append(link.parent_grid)
            s //= 2
        return tuple(g.p2v for g in grids)

    def brickplans(variables, batch, rng):
        from geoformer_tpu.ops.brick import build_brick_plan
        from geoformer_tpu.ops.sparse_conv import (
            build_downsample, voxel_capacities)
        from geoformer_tpu.ops.voxelize import voxelize

        caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
        grids = [voxelize(batch["coords"], batch["point_mask"], caps[0],
                          mc.spatial)]
        s = mc.spatial
        for lvl in range(mc.depth - 1):
            link = build_downsample(grids[-1], s, caps[lvl + 1])
            grids.append(link.parent_grid)
            s //= 2
        occ = mc.brick_occupancy or 64
        bricks = []
        s = mc.spatial
        for lvl in range(mc.depth):
            nb = min(caps[lvl], max(caps[lvl] // occ, 64))
            bricks.append(build_brick_plan(grids[lvl], s, nb))
            s //= 2
        return tuple(bp.occ for bp in bricks)

    def unet(variables, batch, rng):
        from geoformer_tpu.ops.sparse_conv import build_grid_plan, voxel_capacities
        from geoformer_tpu.ops.voxelize import voxel_mean_pool

        def run(mdl):
            caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
            plan = build_grid_plan(
                batch["coords"], batch["point_mask"], mc.spatial, mc.depth, caps,
                brick_occupancy=mc.brick_occupancy or None,
            )
            feats = jnp.concatenate([batch["feats"], batch["points"]], axis=-1)
            vox = voxel_mean_pool(feats, plan.grids[0])
            return mdl.backbone(vox, plan, False)
        return model.apply(variables, rngs={"sample": rng}, method=run)

    def bb(variables, batch, rng):
        def run(mdl):
            return mdl.forward_backbone(batch, train=False)
        return model.apply(variables, rngs={"sample": rng}, method=run)

    def agg(variables, batch, rng):
        def run(mdl):
            pf, ss, sp, _ = mdl.forward_backbone(batch, train=False)
            fg_idx, fg_valid = mdl.foreground_pack(sp, batch["point_mask"])
            fg_locs = jax.vmap(lambda a, i: a[i])(batch["points"], fg_idx)
            fg_feats = jax.vmap(lambda a, i: a[i])(pf, fg_idx)
            return mdl.forward_aggregator(fg_locs, fg_feats, fg_valid, train=False)
        return model.apply(variables, rngs={"sample": rng}, method=run)

    def geo(variables, batch, rng):
        def run(mdl):
            pf, ss, sp, _ = mdl.forward_backbone(batch, train=False)
            fg_idx, fg_valid = mdl.foreground_pack(sp, batch["point_mask"])
            fg_locs = jax.vmap(lambda a, i: a[i])(batch["points"], fg_idx)
            fg_feats = jax.vmap(lambda a, i: a[i])(pf, fg_idx)
            cl, cf, ci, cv = mdl.forward_aggregator(fg_locs, fg_feats, fg_valid, train=False)
            return mdl.forward_geodesic(fg_locs, fg_valid, ci, cv, train=False)
        return model.apply(variables, rngs={"sample": rng}, method=run)

    def dec(variables, batch, rng):
        # prefix through run_decoder (mask tower included — it feeds the
        # mask head, not the decoder, but the full forward computes it
        # before the decoder): full - decoder = dynamic-conv mask head +
        # proposals; decoder - geodesic = rel-pos build + DETR layers +
        # mask tower
        def run(mdl):
            pf, ss, sp, _ = mdl.forward_backbone(batch, train=False)
            fg_idx, fg_valid = mdl.foreground_pack(sp, batch["point_mask"])
            fg_locs = jax.vmap(lambda a, i: a[i])(batch["points"], fg_idx)
            fg_feats = jax.vmap(lambda a, i: a[i])(pf, fg_idx)
            mask_feats = mdl.run_mask_tower(fg_feats, fg_valid, False)
            cl, cf, ci, cv = mdl.forward_aggregator(fg_locs, fg_feats, fg_valid, train=False)
            geo_dist, _, _ = mdl.forward_geodesic(fg_locs, fg_valid, ci, cv, train=False)
            dec_outputs, ql, qv = mdl.run_decoder(
                mdl.encoder_to_decoder_projection, cl, cf, cv, geo_dist, ci,
                batch["pc_mins"], batch["pc_maxs"], False,
            )
            return dec_outputs, mask_feats
        return model.apply(variables, rngs={"sample": rng}, method=run)

    def full(variables, batch, rng):
        out = model.apply(variables, batch, train=False, rngs={"sample": rng})
        return out["mask_logits"]

    stages = {"vox0": vox0, "voxchain": voxchain, "brickplans": brickplans,
              "gridplan": gridplan, "unet": unet, "backbone": bb,
              "aggregator": agg, "geodesic": geo, "decoder": dec, "full": full}
    # "all" keeps the historical stage chain (sub-stages are opt-in)
    want = args.stages.split(",") if args.stages != "all" else [
        "gridplan", "unet", "backbone", "aggregator", "geodesic", "full"]

    r = jax.random.PRNGKey(1)
    for name in want:
        # reduce every stage output to ONE scalar and pull it to host:
        # block_until_ready is a no-op on the tunnel TPU backend, so only a
        # D2H transfer observes completion (same trick as bench.py)
        def scalarized(variables, batch, rng, _fn=stages[name]):
            out = _fn(variables, batch, rng)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)

        fn = jax.jit(scalarized)
        t0 = time.perf_counter()
        float(fn(variables, batch, r))
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(variables, batch, r))
            ts.append(time.perf_counter() - t0)
        print(f"{name:12s} compile+1st={t_compile:8.1f}s  run={np.median(ts) * 1000:9.1f}ms", flush=True)


if __name__ == "__main__":
    main()
