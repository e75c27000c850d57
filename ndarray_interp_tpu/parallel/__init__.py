from .sharding import (
    make_mesh,
    shard_interp1d,
    shard_interp2d,
    shard_queries,
    sharded_eval_1d,
    sharded_eval_2d,
)

__all__ = [
    "make_mesh",
    "shard_interp1d",
    "shard_interp2d",
    "shard_queries",
    "sharded_eval_1d",
    "sharded_eval_2d",
]
