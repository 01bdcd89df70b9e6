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

__all__ = ["shift_trajectory", "shift_duals", "shift_linearization",
           "init_lin_carry", "mpc_step", "make_mpc_controller"]


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


def shift_linearization(lin):
    """Shift a carried (A, B, ptr) linearization one knot forward, aligned
    with :func:`shift_trajectory`: after the shift, knot k's Jacobians were
    computed at the state/control that now sits at knot k.

    OFF by default in :func:`mpc_step` (``lin_shift=False``): on TPU the
    (N-1, n, n) concat relayouts tile-padded buffers and measures as
    expensive as a full relinearization (tools/profile_mpc.py: 31.6 ms vs
    31.7 ms at B=2048) — whereas leaving Jacobians unshifted merely lets
    knot k's Jacobian lag the trajectory by one knot per step, bounded by
    the rotating-refresh cycle (ceil((N-1)/window) steps), with no
    measured quality loss."""
    A, B, ptr = lin
    A = jnp.concatenate([A[1:], A[-1:]], axis=0)
    B = jnp.concatenate([B[1:], B[-1:]], axis=0)
    return A, B, ptr


def init_lin_carry(
    model: DiscreteModel,
    sol: ALSolution,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    batched: bool = False,
):
    """Full linearization of a solution's trajectory + rotating-refresh
    pointer — the initial carry for a ``lin_window``-enabled controller
    (typically built once from the cold solve)."""
    from .solvers.ilqr import _linearize
    from .utils.host import to_host
    model, times, dts = to_host((model, times, dts))

    def init(s):
        return _linearize(model, s.xs, s.us, times, dts, opts)

    if batched:
        init = jax.vmap(init)
    A, B = jax.jit(init)(sol)
    # ONE unbatched pointer for the whole fleet: every scenario refreshes
    # the same rotating window, so the refresh slices stay
    # dynamic_slice/dynamic_update_slice under vmap.  A per-scenario
    # pointer would lower to batched gathers + an XLA scatter over the
    # knot axis — measured 4x slower per MPC step on TPU.
    return A, B, jnp.zeros((), jnp.int32)


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
    lin=None,
    lin_window: int = 0,
    lin_shift: bool = False,
) -> ALSolution:
    """One receding-horizon step: warm-start from ``prev`` and re-solve from
    the measured state.  Pure and jittable; vmap for a controller fleet.

    With ``schedule`` (e.g. ``(3, 3)``), the re-solve uses the fixed
    real-time-iteration solver (deterministic wall-clock, Jacobian reuse)
    instead of the to-tolerance AL loop.  With ``lin`` (an (A, B, ptr)
    carry from :func:`init_lin_carry` / a previous step) the fixed solver
    additionally reuses the previous step's shifted Jacobians and
    relinearizes only a rotating ``lin_window``-knot slice, and the return
    becomes ``(solution, lin)``.
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
            lin_carry=(shift_linearization(lin) if lin_shift else lin)
            if lin is not None else None,
            lin_window=lin_window,
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
    lin_window: int = 0,
    lin_shift: bool = False,
):
    """Compile ``controller(x_measured, prev_solution) -> ALSolution``.

    With ``batched=True`` the controller runs a fleet: x_measured (B, n) and
    a batched previous solution.  ``schedule`` selects the fixed
    real-time-iteration solver (see :func:`mpc_step`).

    With ``lin_window > 0`` (requires ``schedule``) the controller carries
    the dynamics linearization across MPC steps: the signature becomes
    ``controller(x_measured, prev_solution, lin) -> (ALSolution, lin)``
    with the initial ``lin`` from :func:`init_lin_carry`.  Each step reuses
    the previous step's Jacobians and relinearizes only a rotating
    ``lin_window``-knot slice, bounding every knot's staleness to
    ceil((N-1)/lin_window) steps.

    When it pays: Jacobian reuse cuts the linearization FLOPs by
    (N-1-window)/(N-1), which matters when linearization genuinely
    dominates — expensive dynamics (large n, stiff integrators, neural
    models) or the latency-bound small-batch regime.  On the v5e
    throughput benchmark (quadrotor, B=2048, approx1) it measures NEUTRAL
    (59.2 vs 59.0 ms/step, tools/profile_mpc.py): in the fully fused step
    XLA overlaps the jacfwd work, so cutting it buys nothing there.
    Default off.
    """
    blocks = tuple(blocks)
    # Problem data becomes host literals: closed-over DEVICE arrays
    # permanently degrade per-dispatch latency on tunneled backends
    # (utils/host.py).
    from .utils.host import to_host
    model, obj, blocks, times, dts = to_host((model, obj, blocks, times, dts))

    if lin_window > 0:
        if schedule is None:
            raise ValueError("lin_window requires a fixed schedule")

        def step_lin(x, prev, lin):
            return mpc_step(model, obj, blocks, x, prev, times, dts, opts,
                            schedule=schedule, relin_every=relin_every,
                            lin=lin, lin_window=lin_window,
                            lin_shift=lin_shift)

        if batched:
            # The refresh pointer is shared by the fleet (in/out_axes None):
            # see init_lin_carry.
            step_lin = jax.vmap(step_lin, in_axes=(0, 0, (0, 0, None)),
                                out_axes=(0, (0, 0, None)))
        return jax.jit(step_lin)

    def step(x, prev):
        return mpc_step(model, obj, blocks, x, prev, times, dts, opts,
                        schedule=schedule, relin_every=relin_every)

    if batched:
        step = jax.vmap(step)
    return jax.jit(step)
