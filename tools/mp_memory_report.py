#!/usr/bin/env python
"""Compare compiled per-device memory of the full train step at mp=1 vs
mp=2 on an 8-device virtual CPU mesh — evidence that the model-axis
sharding constraints (decoder queries, [B,F,Q] geodesic table, [L,B,Q,F]
mask logits) actually divide the big tensors instead of replicating them.

Run:  python tools/mp_memory_report.py     (re-execs itself with a scrubbed
                                            8-device CPU environment)

Recorded output (2026-08-17, this tree — 8192-point training shapes):
    mesh=data8xmodel1: temp=1174.3MiB output=22.6MiB argument=22.9MiB
    mesh=data4xmodel2: temp=1062.8MiB output=22.6MiB argument=22.9MiB
    temp memory reduction vs mp=1: 1.10x
The modest ratio is honest: training temp memory is dominated by backbone
activations, which are data-parallel (per-device batch is identical at
dp8 and dp4xmp2); the model axis divides only the query-sharded tensors
(geodesic [B,F,Q], decoder, mask logits), which matter at eval scale
(Q=256, F=131k -> the [B,F,Q] table alone is 134MB/scene) and for fitting
larger query counts, not for train-step activation memory.
"""

from __future__ import annotations

import os
import subprocess
import sys


def report() -> None:
    import jax

    from __graft_entry__ import _small_cfg, _synthetic_batch
    from geoformer_tpu.engine import Engine
    from geoformer_tpu.parallel.mesh import make_mesh

    results = {}
    for mp in (1, 2):
        dp = 8 // mp
        cfg = _small_cfg(
            batch_size=dp,
            tpu_max_points=8192, tpu_max_voxels=8192, tpu_max_fg_points=4096,
            tpu_train_subsample=2048, n_decode_point=256, n_query_points=64,
            n_downsampling=4096, tpu_unet_depth=4, tpu_spatial_shape=256,
            tpu_knn_neighbors=16, tpu_geodesic_steps_train=8,
            tpu_geodesic_steps_eval=8, tpu_ball_nsample=16, prepare_epochs=0,
        )
        mesh = make_mesh(8, model_parallel=mp)
        engine = Engine(cfg, few_shot=False, mesh=mesh)
        batch = _synthetic_batch(cfg, dp)
        state = engine.init_state(batch, seed=0)
        rng = jax.random.PRNGKey(0)
        import jax.sharding

        from geoformer_tpu.parallel.mesh import shard_batch

        step = engine._make_train_step(False, 1)
        sb = shard_batch(batch, mesh)
        with jax.sharding.set_mesh(mesh):
            lowered = step.lower(state, sb, None, rng, 1e-3)
        ma = lowered.compile().memory_analysis()
        results[mp] = ma
        mib = 1024 * 1024
        print(
            f"mesh=data{dp}xmodel{mp}: temp={ma.temp_size_in_bytes / mib:.1f}MiB "
            f"output={ma.output_size_in_bytes / mib:.1f}MiB "
            f"argument={ma.argument_size_in_bytes / mib:.1f}MiB",
            flush=True,
        )
    r = results[1].temp_size_in_bytes / max(results[2].temp_size_in_bytes, 1)
    print(f"temp memory reduction vs mp=1: {r:.2f}x")


def main() -> None:
    if os.environ.get("_GEOFORMER_MPMEM_INNER"):
        return report()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "JAX_", "XLA_"))
    }
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["_GEOFORMER_MPMEM_INNER"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], cwd=repo, env=env, timeout=3600
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
