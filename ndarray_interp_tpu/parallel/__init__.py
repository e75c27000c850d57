from .sharding import (
    make_mesh,
    shard_interp1d,
    shard_queries,
    sharded_eval_1d,
)

__all__ = [
    "make_mesh",
    "shard_interp1d",
    "shard_queries",
    "sharded_eval_1d",
]
