"""Batched (data-parallel) solves: vmap the WHOLE AL-iLQR solve over a
scenario axis.

This is the build's first-class replacement for the reference's per-scenario
problem mutation loop (``set_initial_state!`` problem.jl:270,
``update_trajectory!`` objective.jl:207 — SURVEY.md §2.3): thousands of MPC
scenarios become a single (B, N, n)/(B, N, m) tensor program where every
backward-pass block matmul batches across B on the MXU.  Per-scenario
convergence lives inside each solve's ``lax.while_loop`` state, so a vmapped
batch retires scenarios independently (masked iterations).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..dynamics import DiscreteModel
from ..objective import Objective
from ..solvers.al import ALSolution, ConstraintBlock
from ..solvers.altro import altro_solve
from ..solvers.options import SolverOptions

__all__ = ["batch_solve", "make_batch_solver"]


def make_batch_solver(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    batch_objective: bool = False,
    donate: bool = True,
):
    """Build a jitted ``solve(x0s, us0) -> ALSolution`` batched over the
    leading scenario axis.

    ``batch_objective=True`` additionally maps the objective's coefficient
    arrays over scenarios (per-scenario goals/references for tracking MPC);
    otherwise the objective is shared.
    """
    blocks = tuple(blocks)
    # Host literals for closure data (utils/host.py): closed-over device
    # arrays degrade dispatch latency on tunneled backends.  The objective
    # stays a jit ARGUMENT (it may be overridden per call).
    from ..utils.host import to_host
    model, blocks, times, dts = to_host((model, blocks, times, dts))

    def _solve_one(obj_, x0, us0):
        return altro_solve(model, obj_, blocks, x0, us0, times, dts, opts)

    obj_axis = 0 if batch_objective else None
    vmapped = jax.vmap(_solve_one, in_axes=(obj_axis, 0, 0))
    kwargs = dict(donate_argnums=(2,)) if donate else {}
    jitted = jax.jit(lambda obj_, x0s, us0: vmapped(obj_, x0s, us0), **kwargs)

    def solve(x0s: jax.Array, us0: jax.Array, obj_override: Optional[Objective] = None
              ) -> ALSolution:
        return jitted(obj_override if obj_override is not None else obj, x0s, us0)

    return solve


def batch_solve(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x0s: jax.Array,
    us0: jax.Array,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
) -> ALSolution:
    """One-shot batched solve of B scenarios: x0s (B, n), us0 (B, N, m)."""
    solver = make_batch_solver(model, obj, blocks, times, dts, opts, donate=False)
    return solver(x0s, us0)
