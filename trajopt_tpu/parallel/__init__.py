"""Parallelism: batched (vmap) and sharded (mesh/pjit) solves — SURVEY.md §2.3."""
from .batch import batch_solve, make_batch_solver
from .mesh import (BatchStats, SCENARIO_AXIS, make_mesh,
                   make_sharded_mpc_controller, make_sharded_solver)

__all__ = [
    "batch_solve",
    "make_batch_solver",
    "BatchStats",
    "SCENARIO_AXIS",
    "make_mesh",
    "make_sharded_mpc_controller",
    "make_sharded_solver",
]
