from .sharding import (make_mesh, replicate, shard_batch, shard_hint,
                       sharded_model_fn, spmd_mesh)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_hint",
           "sharded_model_fn", "spmd_mesh"]
