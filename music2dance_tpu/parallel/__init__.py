"""Parallelism: device mesh + shard_map data parallelism."""

from .mesh import DATA_AXIS, batch_sharding, make_mesh, replicated, shard_batch
from .dp import shard_decode, shard_tbptt_train_step, shard_train_step
from .distributed import initialize, make_global_mesh, per_host_batch_size

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_train_step",
    "shard_tbptt_train_step",
    "shard_decode",
    "initialize",
    "make_global_mesh",
    "per_host_batch_size",
]
