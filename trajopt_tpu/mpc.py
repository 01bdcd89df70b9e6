"""Receding-horizon MPC utilities: warm-start shifting and batched re-solve.

The reference's MPC machinery is problem mutation + re-solve
(``set_initial_state!`` problem.jl:270, ``setinitialtime!`` problem.jl:280,
``update_trajectory!`` objective.jl:207-212, ``set_LQR_goal!``
cost_functions.jl:249-258 — SURVEY.md §5 'Checkpoint / resume').  Here the
whole MPC step is a pure function: shift the previous solution one knot,
swap in the measured state, and re-solve warm-started (states, controls, and
AL duals), so a fleet of controllers is just a vmap of ``mpc_step``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .dynamics import DiscreteModel
from .objective import Objective
from .solvers.al import ALSolution, ConstraintBlock, al_solve
from .solvers.options import SolverOptions

__all__ = ["shift_trajectory", "shift_duals", "mpc_step", "make_mpc_controller"]


def shift_trajectory(xs: jax.Array, us: jax.Array):
    """Shift a solution one knot forward, repeating the final entries — the
    standard warm start for the next MPC solve."""
    xs_n = jnp.concatenate([xs[1:], xs[-1:]], axis=0)
    us_n = jnp.concatenate([us[1:], us[-1:]], axis=0)
    return xs_n, us_n


def shift_duals(blocks: Sequence[ConstraintBlock], duals):
    """Shift per-block dual trajectories one knot forward where the block
    spans consecutive knots; blocks pinned to single knots keep their dual."""
    out = []
    for block, lam in zip(blocks, duals):
        if len(block.inds) > 1:
            lam = jnp.concatenate([lam[1:], lam[-1:]], axis=0)
        out.append(lam)
    return tuple(out)


def mpc_step(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x_measured: jax.Array,
    prev: ALSolution,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    warm_start_duals: bool = True,
    schedule=None,
    relin_every: int = 2,
) -> ALSolution:
    """One receding-horizon step: warm-start from ``prev`` and re-solve from
    the measured state.  Pure and jittable; vmap for a controller fleet.

    With ``schedule`` (e.g. ``(3, 3)``), the re-solve uses the fixed
    real-time-iteration solver (deterministic wall-clock, Jacobian reuse)
    instead of the to-tolerance AL loop.
    """
    xs_w, us_w = shift_trajectory(prev.xs, prev.us)
    duals = shift_duals(blocks, prev.duals) if warm_start_duals else None
    # Penalties warm-start too: with adapted mu a single dual update per
    # step suffices (otherwise the leftover violation is ~ dlambda/mu_0).
    pens = shift_duals(blocks, prev.penalties) if warm_start_duals else None
    if schedule is not None:
        from .solvers.fixed import al_solve_fixed
        return al_solve_fixed(
            model, obj, blocks, x_measured, us_w, times, dts, opts,
            schedule=tuple(schedule), relin_every=relin_every,
            xs_init=xs_w, duals_init=duals, penalties_init=pens,
        )
    return al_solve(
        model, obj, blocks, x_measured, us_w, times, dts, opts,
        xs_init=xs_w, duals_init=duals, penalties_init=pens,
    )


def make_mpc_controller(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    batched: bool = False,
    schedule=None,
    relin_every: int = 2,
):
    """Compile ``controller(x_measured, prev_solution) -> ALSolution``.

    With ``batched=True`` the controller runs a fleet: x_measured (B, n) and
    a batched previous solution.  ``schedule`` selects the fixed
    real-time-iteration solver (see :func:`mpc_step`).
    """
    blocks = tuple(blocks)
    # Problem data becomes host literals: closed-over DEVICE arrays
    # permanently degrade per-dispatch latency on tunneled backends
    # (utils/host.py).
    from .utils.host import to_host
    model, obj, blocks, times, dts = to_host((model, obj, blocks, times, dts))

    def step(x, prev):
        return mpc_step(model, obj, blocks, x, prev, times, dts, opts,
                        schedule=schedule, relin_every=relin_every)

    if batched:
        step = jax.vmap(step)
    return jax.jit(step)
