"""Device mesh + SPMD sharding helpers.

Replaces the reference's dormant NCCL/DDP scaffolding (util/dist.py:8-182,
util/dataloader_util.py) with jax.sharding: the batch is sharded over a
`data` mesh axis, parameters are replicated, and XLA inserts the gradient
psum — there is no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """("data",) mesh, or ("data","model") when model_parallel > 1.

    The model axis shards the decoder-query dimension (queries are
    independent in cross-attention and the dynamic-conv mask head, so the
    only collective is the final all-gather of mask logits) — the natural
    second axis for this workload; there is no reference analog (§2.6:
    the reference has no working multi-device path at all).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if model_parallel > 1:
        assert len(devs) % model_parallel == 0
        grid = np.asarray(devs).reshape(-1, model_parallel)
        return Mesh(grid, ("data", "model"))
    return Mesh(np.asarray(devs), ("data",))


def maybe_shard(x, *spec):
    """with_sharding_constraint if an ambient mesh carries every named axis
    in `spec`; no-op otherwise (single-chip or data-only mesh)."""
    mesh = jax.sharding.get_abstract_mesh()
    names = set()
    for s in spec:
        if isinstance(s, (tuple, list)):
            names.update(a for a in s if a)
        elif s is not None:
            names.add(s)
    if mesh is None or not names.issubset(set(getattr(mesh, "axis_names", ()) or ())):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_map_data(fn, *args):
    """Run a batch-leading, param-free function under a data-axis shard_map.

    Per-scene stages whose lowering SPMD can't partition (top_k / sort /
    while bodies inside vmap — FPS, ball grouping, radius graphs) otherwise
    get replicated with an all-gather of their inputs on multi-device
    meshes. shard_map pins them to the local batch shard instead. Plain
    call when no divisible "data" axis is ambient. Every arg and every
    output leaf must have the batch as leading dim."""
    mesh = jax.sharding.get_abstract_mesh()
    axes = tuple(getattr(mesh, "axis_names", ()) or ())
    b = args[0].shape[0]
    if "data" not in axes or mesh.shape["data"] <= 1 or b % mesh.shape["data"]:
        return fn(*args)
    out_specs = jax.tree.map(lambda _: P("data"), jax.eval_shape(fn, *args))
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(P("data") for _ in args),
        out_specs=out_specs,
        check_vma=False,  # bodies are collective-free per-scene code
    )(*args)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    # batch dim over "data" only; per-scene dims replicated (the model's
    # sharding constraints split queries over "model" where present)
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with B divisible by mesh size onto the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
