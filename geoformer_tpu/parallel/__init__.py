from geoformer_tpu.parallel.mesh import make_mesh, shard_batch
from geoformer_tpu.parallel.train_state import TrainState, create_train_state, make_optimizer

__all__ = ["make_mesh", "shard_batch", "TrainState", "create_train_state", "make_optimizer"]
