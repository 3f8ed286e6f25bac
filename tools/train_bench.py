#!/usr/bin/env python
"""Training-step throughput at a given scale (single chip or a mesh).

Times the FULL jitted train step (forward + losses + matcher + backward +
optax update) on synthetic batches, D2H-observed (block_until_ready is a
no-op on the tunnel backend). Defaults mirror the shipped production
training scale per scene (config/geoformer_scannet.yaml: 250k-point scenes,
30k train subsample, 2048 contexts, 128 queries) at --batch_size 1; the
reference trains batch 16 over 4 GPUs (train.py:101-141, DDP) — pass
--batch_size/--mesh to match multi-chip setups.

Usage: python tools/train_bench.py [--batch_size 1] [--steps 5] [--prepare]
       [--fs]  (episodic few-shot step: support encode + FS criterion)
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--points", type=int, default=250000)
    ap.add_argument("--voxels", type=int, default=262144)
    ap.add_argument("--fg", type=int, default=131072)
    ap.add_argument("--subsample", type=int, default=30000)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--contexts", type=int, default=2048)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--spatial", type=int, default=1024)
    ap.add_argument("--brick_occupancy", type=int, default=64)
    ap.add_argument("--prepare", action="store_true",
                    help="semantic-only phase (epoch <= prepare_epochs)")
    ap.add_argument("--fs", action="store_true",
                    help="episodic few-shot train step (GeoFormerFS + "
                         "FSInstSetCriterion; ref train_fs.py bs=8)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="devices for a (data[,model]) mesh (0 = no mesh)")
    ap.add_argument("--remat", type=int, default=1,
                    help="jax.checkpoint residual blocks (shipped prod "
                         "default; 0 = keep all activations, OOMs one v5e "
                         "chip at prod capacities — ONCHIP_SUITE_r4)")
    ap.add_argument("--brick_fold", type=int, default=None,
                    help="override tpu_brick_fold_max_c (x-folded levels)")
    ap.add_argument("--f32", action="store_true",
                    help="f32 level residency (shipped prod default is "
                         "bf16; no-remat f32 measured 21.2 GB HBM)")
    ap.add_argument("--accum", type=int, default=1,
                    help="grad_accum_steps: micro-steps averaged per optax "
                         "update (effective batch = batch_size * accum; the "
                         "reference's bs=16/8 on a B=1 chip)")
    args = ap.parse_args()

    from geoformer_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from geoformer_tpu.engine import Engine
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(
        None,
        batch_size=args.batch_size,
        n_decode_point=args.contexts,
        n_query_points=args.queries,
        n_downsampling=50000,
        tpu_max_points=args.points,
        tpu_max_voxels=args.voxels,
        tpu_max_fg_points=args.fg,
        tpu_train_subsample=args.subsample,
        tpu_max_instances=64,
        tpu_knn_neighbors=64,
        tpu_spatial_shape=args.spatial,
        tpu_unet_depth=args.depth,
        tpu_ball_nsample=64,
        tpu_brick_occupancy=args.brick_occupancy,
        # an explicit --brick_fold also forces the fold INTO the train
        # step (tpu_brick_fold_train; default train runs unfolded after
        # the r5c fold32 OOM) so the A/B arm measures what it names
        **({} if args.brick_fold is None
           else {"tpu_brick_fold_max_c": args.brick_fold,
                 "tpu_brick_fold_train": args.brick_fold > 0}),
        tpu_remat=bool(args.remat),
        tpu_compute_dtype="float32" if args.f32 else "bfloat16",
        prepare_epochs=120 if args.prepare else 0,
        grad_accum_steps=args.accum,
    )
    mesh = None
    if args.mesh:
        from geoformer_tpu.parallel.mesh import make_mesh

        mp = 2 if args.mesh % 2 == 0 and args.mesh > 1 else 1
        mesh = make_mesh(args.mesh, model_parallel=mp)
        print(f"mesh: data{args.mesh // mp} x model{mp}")

    import jax.numpy as jnp

    def make_support(bs, seed):
        # episodic support scene: same synthetic generator + a support mask
        # over a spatial blob (the reference's support is a masked crop of
        # a scene containing the class, datasets/scannetv2_fs_inst.py)
        sup = dict(_synthetic_batch(cfg, bs, seed=seed + 10_000))
        pts = np.asarray(sup["points"])
        center = pts.mean(axis=1, keepdims=True)
        r2 = ((pts - center) ** 2).sum(-1)
        thresh = np.quantile(r2, 0.2, axis=1, keepdims=True)
        sup["support_masks"] = jnp.asarray(r2 <= thresh)
        return sup

    engine = Engine(cfg, few_shot=args.fs, mesh=mesh)
    batch = _synthetic_batch(cfg, args.batch_size, seed=0)
    support = make_support(args.batch_size, 0) if args.fs else None
    print(f"device={jax.devices()[0]} B={args.batch_size} "
          f"points={args.points} subsample={args.subsample} "
          f"phase={'fs-episodic' if args.fs else ('prepare' if args.prepare else 'full')}",
          flush=True)

    state = engine.init_state(batch, seed=0, example_support=support)
    rng = jax.random.PRNGKey(0)
    epoch = 1 if args.prepare else cfg.prepare_epochs + 1

    t0 = time.perf_counter()
    state, loss, loss_dict, lr = engine.train_step(
        state, batch, epoch=epoch, rng=rng, support=support)
    print(f"compile+1st: {time.perf_counter() - t0:.1f}s loss={float(loss):.4f}",
          flush=True)

    ts = []
    for i in range(args.steps):
        batch_i = _synthetic_batch(cfg, args.batch_size, seed=i + 1)
        support_i = make_support(args.batch_size, i + 1) if args.fs else None
        t0 = time.perf_counter()
        state, loss, loss_dict, lr = engine.train_step(
            state, batch_i, epoch=epoch, rng=jax.random.fold_in(rng, i),
            support=support_i,
        )
        _ = float(loss)  # D2H observes completion on the tunnel backend
        ts.append(time.perf_counter() - t0)
        print(f"step {i + 1}: {ts[-1] * 1000:.1f}ms loss={float(loss):.4f}",
              flush=True)
    p50 = float(np.median(ts))
    sps = args.batch_size / p50
    print(f"p50 step: {p50 * 1000:.1f}ms  scenes/s: {sps:.2f}", flush=True)
    if args.accum > 1:
        print(f"accum={args.accum}: effective batch "
              f"{args.batch_size * args.accum}, optimizer update every "
              f"{args.accum} micro-steps ({p50 * args.accum * 1000:.1f}ms "
              f"p50 per update)", flush=True)

    # per-device compiled memory accounting, where the backend exposes it
    try:
        from geoformer_tpu.parallel.mesh import shard_batch

        key = ((not args.fs) and args.prepare, 0 if args.prepare else cfg.prepare_epochs + 1)
        key = (key[0] and not args.fs, key[1])
        step = engine._train_steps[key]
        sb = shard_batch(batch, engine.mesh)
        ss = shard_batch(support, engine.mesh) if args.fs else None
        with jax.sharding.set_mesh(engine.mesh):
            ma = step.lower(state, sb, ss, rng, 1e-3).compile().memory_analysis()
        if ma is not None:
            print(f"compiled per-device: temp={ma.temp_size_in_bytes / 1e6:.1f}MB "
                  f"args={ma.argument_size_in_bytes / 1e6:.1f}MB "
                  f"output={ma.output_size_in_bytes / 1e6:.1f}MB", flush=True)
    except Exception as e:
        print(f"memory analysis unavailable: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
