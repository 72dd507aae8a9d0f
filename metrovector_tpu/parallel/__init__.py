"""Multi-chip scaling: mesh sharding, ICI top-k merge, host-DRAM streaming."""

from .mesh import SHARD_AXIS, make_mesh, replicate, rows_per_shard, shard_rows
from .sharded_search import ShardedDeviceSpace, sharded_topk
from .streaming import StreamingSearcher

__all__ = [
    "SHARD_AXIS",
    "ShardedDeviceSpace",
    "StreamingSearcher",
    "make_mesh",
    "replicate",
    "rows_per_shard",
    "shard_rows",
    "sharded_topk",
]
