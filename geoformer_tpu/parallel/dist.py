"""Multi-host SPMD helpers (reference util/dist.py:8-182 equivalents).

The reference's dormant NCCL layer exposed init_process_group, rank/world
helpers, rank-0-only logging, and per-rank seeding (train.py:169-171).
The TPU-native versions wrap jax.distributed: one process per host, XLA
collectives over ICI/DCN do all communication, and the data pipeline
shards episodes by process the way DistributedSampler sharded indices
(util/dataloader_util.py:100-157).
"""

from __future__ import annotations

import jax


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX. No-op for single-process runs; with TPU pod
    environment variables (or explicit args) it wires up the DCN mesh."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def get_rank() -> int:
    """Process index (the reference's dist.get_rank, util/dist.py:24-34)."""
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 gate for logging/checkpointing (util/dist.py:36-49)."""
    return jax.process_index() == 0


def local_seed(base_seed: int) -> int:
    """Per-process seed offset (train.py:169-171 seeds rank-offset RNGs)."""
    return base_seed + jax.process_index()


def shard_indices(n_items: int, batch_size: int, seed: int):
    """Deterministic per-process index shard, DistributedSampler semantics
    (util/dataloader_util.py:100-157): same shuffled order everywhere,
    each process takes a strided slice padded to equal length."""
    import numpy as np

    g = np.random.default_rng(seed)
    order = g.permutation(n_items)
    world, rank = get_world_size(), get_rank()
    per = -(-n_items // world)
    padded = np.concatenate([order, order[: per * world - n_items]])
    return padded[rank::world]
