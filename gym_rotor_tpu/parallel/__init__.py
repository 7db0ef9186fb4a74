from .mesh import make_mesh, shard_batch
from .train_step import make_sharded_td3_superstep

__all__ = ["make_mesh", "shard_batch", "make_sharded_td3_superstep"]
