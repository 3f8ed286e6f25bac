from geoformer_tpu.parallel.mesh import make_mesh, shard_batch
from geoformer_tpu.parallel.train_state import TrainState, create_train_state, make_optimizer
from geoformer_tpu.parallel.dist import (
    get_rank,
    get_world_size,
    init_distributed,
    is_primary,
    local_seed,
    shard_indices,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "get_rank",
    "get_world_size",
    "init_distributed",
    "is_primary",
    "local_seed",
    "shard_indices",
]
