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
from .ilqr import _backward_pass, _forward_pass, _linearize, _linearize_knots
from .options import SolverOptions

__all__ = ["al_solve_fixed", "refresh_linearization"]


def refresh_linearization(model, AB, xs, us, times, dts, opts,
                          ptr, window: int):
    """Refresh a ``window``-knot slice of carried dynamics Jacobians.

    Real-time-iteration MPC steps can carry the previous step's (A, B)
    linearization (shifted one knot, like the warm-started trajectory) and
    relinearize only a rotating window per step: linearization is the
    dominant per-step cost on TPU (CLAUDE.md measured breakdown), Jacobians
    vary smoothly along the trajectory, and the rotating pointer bounds the
    staleness of every knot to ceil((N-1)/window) MPC steps.

    ``ptr`` is a traced int32 (per-scenario under vmap); the window length
    is static, so the refresh costs window/(N-1) of a full relinearization
    regardless of the pointer value.  Choose ``window`` dividing N-1 for
    even coverage (lax.dynamic_slice clamps at the end otherwise).
    """
    A, B = AB
    n_knots = A.shape[0]
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ptr, window)
    A_w, B_w = _linearize_knots(model, sl(xs), sl(us), sl(times), sl(dts),
                                opts)
    A = jax.lax.dynamic_update_slice_in_dim(A, A_w, ptr, axis=0)
    B = jax.lax.dynamic_update_slice_in_dim(B, B_w, ptr, axis=0)
    ptr = (ptr + window) % n_knots
    return (A, B), ptr


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
    lin_carry=None,
    lin_window: int = 0,
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
    lin_ptr = None
    if lin_carry is not None:
        # Cross-step Jacobian carry (real-time-iteration MPC): reuse the
        # previous step's shifted (A, B) everywhere except a rotating
        # ``lin_window``-knot refresh — see refresh_linearization.
        A_c, B_c, lin_ptr = lin_carry
        AB, lin_ptr = refresh_linearization(
            model, (A_c, B_c), xs[:-1], us[:-1], times[:-1], dts[:-1],
            opts, lin_ptr, lin_window)
    for seg in schedule:
        cost_fn, expand_fn = make_al_functions(
            obj, blocks, lams, mus,
            exact_hessian=opts.al_hessian_exact)
        J = cost_fn(xs, us)
        for i in range(seg):
            # Global relinearization cadence (counts across segments).
            if lin_carry is None and (AB is None
                                      or total_iters % relin_every == 0):
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

    J_final = obj.cost(xs, us) if opts.record_final_cost else J
    sol = ALSolution(
        xs=xs, us=us, J=J_final, max_violation=viol_prev,
        iterations=jnp.asarray(total_iters, jnp.int32),
        outer_iterations=jnp.asarray(len(schedule), jnp.int32),
        gradient=grad,
        converged=viol_prev < opts.constraint_tolerance,
        duals=lams, penalties=mus,
    )
    if lin_carry is not None:
        A_c, B_c = AB
        return sol, (A_c, B_c, lin_ptr)
    return sol
