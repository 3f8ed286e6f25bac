#!/usr/bin/env python
"""Dump the compiled HLO of the prod-scale unet stage and print the
definitions of named fusions/whiles (to attribute profiler hot spots).

Usage: python tools/dump_unet_hlo.py --find fusion.3552 fusion.3557 while.112
"""

from __future__ import annotations

import argparse
import re

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
    ap.add_argument("--find", type=str, nargs="*", default=[])
    ap.add_argument("--out", type=str, default="/tmp/unet_hlo.txt")
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

    fn = jax.jit(lambda v, b, r: jnp.sum(unet(v, b, r)))
    txt = fn.lower(variables, batch, jax.random.PRNGKey(1)).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)} bytes)")

    for name in args.find:
        # print the op line that CALLS this computation and the computation header
        safe = re.escape(name)
        callers = re.findall(rf"^.*=\s.*{safe}[^\d].*$", txt, flags=re.M)
        for c in callers[:3]:
            print(f"--- {name} caller:\n{c.strip()[:900]}")
        m = re.search(rf"^%?{safe}[^\d][^\n]*\{{", txt, flags=re.M)
        if m:
            start = m.start()
            print(f"--- {name} body head:\n{txt[start:start + 1500]}")


if __name__ == "__main__":
    main()
