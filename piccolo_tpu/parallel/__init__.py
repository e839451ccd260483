"""Multi-chip sharding: candidate x point SPMD over a device mesh."""

from .fused import (
    ShardedGridPlan,
    localize_query_sharded,
    shard_cloud,
    shard_grid_plan,
    shard_hist_plan,
)
from .sharding import init_distributed, make_mesh, solve_sharded

__all__ = [
    "make_mesh",
    "solve_sharded",
    "localize_query_sharded",
    "init_distributed",
    "shard_cloud",
    "shard_grid_plan",
    "shard_hist_plan",
    "ShardedGridPlan",
]
