"""Fixed-schedule AL-iLQR step for real-time MPC.

``al_solve`` is the full solver: data-dependent ``while_loop``s running to
tolerance.  Under ``vmap`` a fleet pays the straggler's iteration count and
re-linearizes every iteration.  This variant unrolls a STATIC schedule at
trace time — the production MPC cycle:

  * ``schedule=(k1, k2, ...)``: k_i iLQR iterations, then a dual/penalty
    update, per segment; no while_loops anywhere (deterministic wall-clock,
    the real-time-iteration pattern of MPC practice);
  * ``relin_every``: dynamics Jacobians are reused across iterations within
    a segment (iLQR is Gauss-Newton: with warm starts the trajectory moves
    little between iterations, and linearization is the dominant
    per-iteration cost on TPU).

Returns the same :class:`ALSolution` as ``al_solve`` (iterations = the
static total).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..dynamics import DiscreteModel, rollout
from ..objective import Objective
from .al import (
    ALSolution, ConstraintBlock, eval_blocks, init_duals, make_al_functions,
    max_violation_blocks, update_duals, update_penalties,
)
from .ilqr import _backward_pass, _forward_pass, _linearize
from .options import SolverOptions

__all__ = ["al_solve_fixed"]


def al_solve_fixed(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x0: jax.Array,
    us_init: jax.Array,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    schedule: Tuple[int, ...] = (3, 3),
    relin_every: int = 2,
    xs_init: jax.Array = None,
    duals_init=None,
    penalties_init=None,
) -> ALSolution:
    blocks = tuple(blocks)
    dtype = us_init.dtype
    if xs_init is not None:
        # Warm start: trust the shifted trajectory outright.  A fresh
        # fallback rollout here costs a full sequential N-step scan per MPC
        # step and only helps when xs is non-finite but us is finite — the
        # forward pass's isfinite acceptance already rejects such steps,
        # and fleet-level recovery (reset on divergence) is the MPC pattern.
        xs = xs_init
    else:
        xs = rollout(model, x0, us_init, times, dts)
    us = us_init

    lams, mus = init_duals(blocks, opts, dtype)
    if duals_init is not None:
        lams = duals_init
    if penalties_init is not None:
        mus = penalties_init

    rho = jnp.asarray(opts.bp_reg_initial, dtype)
    viol_prev = jnp.full((), jnp.inf, dtype)
    grad = jnp.full((), jnp.inf, dtype)
    total_iters = 0

    AB = None
    for seg in schedule:
        cost_fn, expand_fn = make_al_functions(obj, blocks, lams, mus)
        J = cost_fn(xs, us)
        for i in range(seg):
            # Global relinearization cadence (counts across segments).
            if AB is None or total_iters % relin_every == 0:
                AB = _linearize(model, xs, us, times, dts, opts)
            bp = _backward_pass(model, expand_fn, xs, us, times, dts, rho,
                                jnp.ones((), dtype), opts, AB=AB)
            xs_n, us_n, J_n, lsf = _forward_pass(
                model, cost_fn, xs, us, bp.K, bp.d, bp.dV1, bp.dV2, J, x0,
                times, dts, opts)
            lsf = lsf | bp.fail
            xs = jnp.where(bp.fail, xs, xs_n)
            us = jnp.where(bp.fail, us, us_n)
            J = jnp.where(bp.fail, J, J_n)
            grad = jnp.mean(
                jnp.max(jnp.abs(bp.d) / (jnp.abs(us[:-1]) + 1), axis=-1))
            up = jnp.where(bp.fail, opts.bp_reg_increase_factor ** 4,
                           opts.bp_reg_increase_factor)
            rho_up = jnp.minimum(jnp.maximum(rho * up, opts.bp_reg_min),
                                 opts.bp_reg_max)
            rho_dn = rho / opts.bp_reg_increase_factor
            rho_dn = jnp.where(rho_dn < opts.bp_reg_min, 0.0, rho_dn)
            rho = jnp.where(lsf, rho_up, rho_dn)
            total_iters += 1

        cvals = eval_blocks(blocks, xs, us)
        viol = max_violation_blocks(blocks, cvals)
        lams = update_duals(blocks, lams, mus, cvals, opts)
        if opts.penalty_conditional:
            keep = (viol < opts.constraint_tolerance) | (
                viol < opts.penalty_conditional_ratio * viol_prev)
        else:
            keep = viol < opts.constraint_tolerance
        mus = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, old, new),
            update_penalties(mus, opts), mus)
        viol_prev = viol

    return ALSolution(
        xs=xs, us=us, J=obj.cost(xs, us), max_violation=viol_prev,
        iterations=jnp.asarray(total_iters, jnp.int32),
        outer_iterations=jnp.asarray(len(schedule), jnp.int32),
        gradient=grad,
        converged=viol_prev < opts.constraint_tolerance,
        duals=lams, penalties=mus,
    )
