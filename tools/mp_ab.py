#!/usr/bin/env python
"""dp x mp A/B on the virtual CPU mesh: compiled per-device memory + step
wall time for (a) the full train step at a fixed GLOBAL batch and (b) the
bs=1 eval forward (where the model axis is the only usable parallelism).

The driver's dryrun env (xla_force_host_platform_device_count) gives N
virtual CPU devices; wall-clock here is CPU-relative (NOT TPU-absolute) —
the decision signal is the per-device compiled memory and the relative
scaling of the shard_map'ed geodesic leg. Results feed BASELINE.md's
"model-axis production story" section (VERDICT r3 #8).

Usage (inner env is set up automatically, like __graft_entry__):
  python tools/mp_ab.py --n_devices 8 --scale mid
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

SCALES = {
    # matches __graft_entry__ dryrun shapes
    "tiny": dict(tpu_max_points=1024, tpu_max_voxels=1024,
                 tpu_max_fg_points=512, tpu_train_subsample=256,
                 n_decode_point=64, n_query_points=16, n_downsampling=512,
                 tpu_unet_depth=3, tpu_spatial_shape=128, tpu_knn_neighbors=8,
                 tpu_geodesic_steps_train=8, tpu_geodesic_steps_eval=8,
                 tpu_ball_nsample=8, tpu_max_instances=16),
    "mid": dict(tpu_max_points=16384, tpu_max_voxels=16384,
                tpu_max_fg_points=8192, tpu_train_subsample=4096,
                n_decode_point=512, n_query_points=128, n_downsampling=8192,
                tpu_unet_depth=7, tpu_spatial_shape=512, tpu_knn_neighbors=16,
                tpu_geodesic_steps_train=16, tpu_geodesic_steps_eval=32,
                tpu_ball_nsample=32, tpu_max_instances=32),
    # the shipped production capacities (config/geoformer_scannet.yaml TPU)
    "prod": dict(tpu_max_points=250000, tpu_max_voxels=262144,
                 tpu_max_fg_points=131072, tpu_train_subsample=30000,
                 n_decode_point=2048, n_query_points=256,
                 n_downsampling=50000, tpu_unet_depth=7,
                 tpu_spatial_shape=1024, tpu_knn_neighbors=64,
                 tpu_geodesic_steps_train=32, tpu_geodesic_steps_eval=64,
                 tpu_ball_nsample=64, tpu_max_instances=64,
                 tpu_brick_occupancy=64),
}


def _inner(args):
    import jax
    import numpy as np

    from __graft_entry__ import _small_cfg, _synthetic_batch
    from geoformer_tpu.engine import Engine
    from geoformer_tpu.parallel.mesh import make_mesh, shard_batch

    n = args.n_devices
    global_bs = args.global_batch
    print(f"devices={len(jax.devices())} scale={args.scale} "
          f"global_bs={global_bs}", flush=True)

    for mp in (int(x) for x in args.mp.split(",")):
        dp = n // mp
        assert global_bs % dp == 0, (global_bs, dp)
        cfg = _small_cfg(batch_size=global_bs, prepare_epochs=0,
                         **SCALES[args.scale])
        mesh = make_mesh(n, model_parallel=mp)
        engine = Engine(cfg, few_shot=False, mesh=mesh)
        batch = _synthetic_batch(cfg, global_bs)
        state = engine.init_state(batch, seed=0)
        rng = jax.random.PRNGKey(0)

        # ---- train step: compiled per-device memory + one stepped time
        step = engine._make_train_step(False, cfg.prepare_epochs + 1)
        with jax.sharding.set_mesh(mesh):
            sb = shard_batch(batch, mesh)
            t0 = time.perf_counter()
            compiled = step.lower(state, sb, None, rng, 1e-3).compile()
            compile_s = time.perf_counter() - t0
            ma = compiled.memory_analysis()
            t0 = time.perf_counter()
            out = compiled(state, sb, None, rng, 1e-3)
            jax.block_until_ready(out)
            run_s = time.perf_counter() - t0
            state = out[0]  # the step donates its input state
        mem = (f"temp={ma.temp_size_in_bytes / 1e6:.1f}MB "
               f"args={ma.argument_size_in_bytes / 1e6:.1f}MB "
               f"out={ma.output_size_in_bytes / 1e6:.1f}MB"
               if ma is not None else "n/a")
        print(f"train dp{dp}xmp{mp}: per-device {mem} "
              f"compile={compile_s:.1f}s step={run_s * 1e3:.0f}ms (CPU-relative)",
              flush=True)

        # ---- eval forward at bs=1 (reference protocol): mp is the only
        # axis that can help; dp>1 idles all but one data group
        cfg_e = cfg.replace(batch_size=1)
        engine_e = Engine(cfg_e, few_shot=False, mesh=mesh)
        batch_e = _synthetic_batch(cfg_e, 1)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "constants": state.constants}
        model = engine_e.model

        def fwd(variables, b, rng):
            out = model.apply(variables, b, train=False,
                              rngs={"sample": rng})
            return out["mask_logits"].sum(), out["semantic_scores"].sum()

        with jax.sharding.set_mesh(mesh):
            jfwd = jax.jit(fwd)
            compiled_e = jfwd.lower(variables, batch_e, rng).compile()
            ma_e = compiled_e.memory_analysis()
            o = compiled_e(variables, batch_e, rng)
            jax.block_until_ready(o)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = compiled_e(variables, batch_e, rng)
                jax.block_until_ready(o)
                ts.append(time.perf_counter() - t0)
        mem_e = (f"temp={ma_e.temp_size_in_bytes / 1e6:.1f}MB"
                 if ma_e is not None else "n/a")
        print(f"eval bs=1 dp{dp}xmp{mp}: per-device {mem_e} "
              f"p50={np.median(ts) * 1e3:.0f}ms (CPU-relative)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--scale", choices=SCALES, default="mid")
    ap.add_argument("--global_batch", type=int, default=8)
    ap.add_argument("--mp", type=str, default="1,2",
                    help="comma list of model-parallel degrees to A/B")
    args = ap.parse_args()

    if os.environ.get("_GEOFORMER_MPAB_INNER"):
        return _inner(args)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "JAX_", "XLA_"))}
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.n_devices}")
    env["_GEOFORMER_MPAB_INNER"] = "1"
    proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                           *sys.argv[1:]], cwd=repo, env=env)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
