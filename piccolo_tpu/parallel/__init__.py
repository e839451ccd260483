"""Multi-chip sharding: candidate x point SPMD over a device mesh."""

from .fused import localize_query_sharded
from .sharding import init_distributed, make_mesh, solve_sharded

__all__ = [
    "make_mesh",
    "solve_sharded",
    "localize_query_sharded",
    "init_distributed",
]
