#!/usr/bin/env python
"""Two-process multihost smoke: jax.distributed.initialize on localhost +
psum gradient sync + the parallel/dist helpers.

Replaces-in-spirit the reference's never-exercised NCCL path
(util/dist.py:52-72, commented mp.spawn at train.py:244-253): two CPU
processes form one JAX job (2 forced host devices each -> a 4-device
global data mesh), each contributes a different local batch shard, and the
jitted step psums gradients over the mesh, so both processes must end with
identical parameters.

Usage:  python tools/multihost_smoke.py          # parent: spawns 2 workers
        (workers re-exec this file with --process_id/--num_processes)

Recorded output (2026-08-16, this tree):
    [rank 0] world=2 global_devices=4 primary=True shard=[8 2 9 4 3]
    [rank 1] world=2 global_devices=4 primary=False shard=[6 7 5 0 1]
    [rank 0] step0 loss=1.000000 step1 loss=0.742041
    [rank 1] step0 loss=1.000000 step1 loss=0.742041
    [rank 0] params_digest=0.703371167
    [rank 1] params_digest=0.703371167
    MULTIHOST_SMOKE_OK
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.distributed.initialize(coordinator, num_processes, process_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from geoformer_tpu.parallel.dist import get_rank, get_world_size, is_primary, shard_indices

    rank, world = get_rank(), get_world_size()
    shard = shard_indices(10, 2, seed=0)
    print(
        f"[rank {rank}] world={world} global_devices={len(jax.devices())} "
        f"primary={is_primary()} shard={shard}",
        flush=True,
    )

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    n_local = len(jax.local_devices())
    # per-process local shard of a global batch: different data per rank
    rng = np.random.default_rng(100 + rank)
    local = rng.normal(size=(n_local * 4, 8)).astype(np.float32)
    gx = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    w = jnp.zeros((8,), jnp.float32)  # replicated params

    @jax.jit
    def step(w, x):
        def loss_fn(w):
            pred = x @ w
            return jnp.mean((pred - 1.0) ** 2)  # psum'd by XLA across shards

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    losses = []
    for _ in range(2):
        w, loss = step(w, gx)
        losses.append(float(loss))
    print(
        f"[rank {rank}] step0 loss={losses[0]:.6f} step1 loss={losses[1]:.6f}",
        flush=True,
    )
    digest = float(jnp.sum(jnp.abs(w)))
    print(f"[rank {rank}] params_digest={digest:.9f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    if args.process_id is not None:
        return worker(args.coordinator, args.num_processes, args.process_id)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "JAX_", "XLA_"))
    }
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    coord = "localhost:12355"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--coordinator", coord,
             "--num_processes", "2", "--process_id", str(i)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for o in outs:
        sys.stdout.write(o)
    ok = all(p.returncode == 0 for p in procs)
    digests = [l for o in outs for l in o.splitlines() if "params_digest" in l]
    vals = [l.split("=")[-1] for l in digests]
    synced = len(set(vals)) == 1 and len(vals) == 2
    if ok and synced:
        print("MULTIHOST_SMOKE_OK")
    else:
        print(f"MULTIHOST_SMOKE_FAILED rc_ok={ok} synced={synced}")
        sys.exit(1)


if __name__ == "__main__":
    main()
