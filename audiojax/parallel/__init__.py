from .sharding import make_mesh, replicate, shard_batch, sharded_model_fn

__all__ = ["make_mesh", "replicate", "shard_batch", "sharded_model_fn"]
