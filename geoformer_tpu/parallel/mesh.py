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
