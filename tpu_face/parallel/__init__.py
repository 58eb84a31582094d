from .sharding import (data_parallel_mesh, infer_sharded, shard_batch)

__all__ = ["data_parallel_mesh", "shard_batch", "infer_sharded"]
