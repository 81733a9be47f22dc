"""Mesh parallelism (new vs the single-process reference; SURVEY.md §5.8)."""

from .mesh import (
    ShardedArrayVS,
    default_mesh,
    make_sharded_tt_batch_eval,
    parallel_map_patches,
    shard_batch_eval,
    shard_vector,
    sharded_gram,
)

__all__ = [
    "ShardedArrayVS",
    "default_mesh",
    "make_sharded_tt_batch_eval",
    "parallel_map_patches",
    "shard_batch_eval",
    "shard_vector",
    "sharded_gram",
]
