#!/usr/bin/env python
"""Capture a jax.profiler trace of the prod-scale U-Net conv stack and
print the top device ops by total time (parsed from the perfetto trace).

Usage: python tools/profile_unet.py [--points ...] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=250000)
    ap.add_argument("--voxels", type=int, default=262144)
    ap.add_argument("--fg", type=int, default=131072)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--spatial", type=int, default=1024)
    ap.add_argument("--brick_occupancy", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", type=str, default="/tmp/unet_profile")
    ap.add_argument("--stage", type=str, default="unet", choices=["unet", "full"])
    args = ap.parse_args()

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(
        None, batch_size=1, tpu_max_points=args.points, tpu_max_voxels=args.voxels,
        tpu_max_fg_points=args.fg, tpu_max_instances=64, tpu_knn_neighbors=64,
        tpu_geodesic_steps_eval=64, tpu_spatial_shape=args.spatial,
        tpu_unet_depth=args.depth, tpu_ball_nsample=64,
        tpu_brick_occupancy=args.brick_occupancy,
        **({"tpu_bf16": True} if args.bf16 else {}),
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    batch = _synthetic_batch(cfg, 1, seed=0)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": k1, "sample": k2, "dropout": k3}, batch
    )

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

    def full(variables, batch, rng):
        return model.apply(variables, batch, train=False, rngs={"sample": rng})["mask_logits"]

    stage = unet if args.stage == "unet" else full
    fn = jax.jit(lambda v, b, r: jnp.sum(stage(v, b, r)[0]
                                         if isinstance(stage(v, b, r), tuple)
                                         else stage(v, b, r)))
    r = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    float(fn(variables, batch, r))  # compile + 1st
    print(f"compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(2):
        float(fn(variables, batch, r))

    os.makedirs(args.dir, exist_ok=True)
    jax.profiler.start_trace(args.dir)
    for _ in range(3):
        float(fn(variables, batch, r))
    jax.profiler.stop_trace()

    # parse perfetto trace: sum device-op durations by name
    paths = sorted(glob.glob(os.path.join(args.dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace written — backend may not support profiling")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # device track: pick pid whose process name mentions TPU/device
    names = {}
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        nm = ev.get("name", "?")
        dur = ev.get("dur", 0)
        t, c = names.get(nm, (0, 0))
        names[nm] = (t + dur, c + 1)
    total = sum(t for t, _ in names.values())
    print(f"trace: {paths[-1]}  pids={sorted(pid_names.items())[:8]}")
    print(f"{'us_total':>10} {'count':>6}  name")
    for nm, (t, c) in sorted(names.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{t:>10} {c:>6}  {nm[:110]}")
    print(f"sum over shown pids: {total} us (3 iterations)")


if __name__ == "__main__":
    main()
