"""Parallelism: vmapped restarts, batched hyperparameter grids, and GSPMD
mesh sharding."""

from .grid import grid_solve
from .restarts import vmapped_solve
from .sharding import data_sharding, factor_shardings, make_mesh, shard_solver_operands

__all__ = [
    "vmapped_solve",
    "grid_solve",
    "make_mesh",
    "data_sharding",
    "factor_shardings",
    "shard_solver_operands",
]
