"""parallel — device-mesh scaling helpers (SPMD over scenarios and time)."""

from .mesh import batched_solve, make_mesh, shard_batch

__all__ = ["make_mesh", "shard_batch", "batched_solve"]
