"""Multi-chip sharding: candidate x point SPMD over a device mesh."""

from .sharding import make_mesh, solve_sharded

__all__ = ["make_mesh", "solve_sharded"]
