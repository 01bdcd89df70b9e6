"""Augmented-Lagrangian outer loop over iLQR (AL-iLQR).

Re-design of the solve loop the reference delegates to Altro.jl
(SURVEY.md §3.5; /root/reference/docs/old/solving.md), built around a single
*uniform conic* PHR formulation that covers Equality, Inequality, and
SecondOrderCone constraints with one code path:

    L_A = f(x) + sum_i 1/(2 mu_i) ( ||Pi_{K*}(lambda_i - mu_i c_i)||^2
                                    - ||lambda_i||^2 )

with Pi_{K*} the projection onto the dual cone (cones.jl:65-69).  This is
algebraically the classic AL for equality (Pi = identity), the
Rockafellar/PHR active-set form for inequality (Pi = min(0, .)), and the
conic AL of the reference's design sketch for SOC (test/socp.jl:52-81:
penalty psi = c - Pi_K(c), gradient (I - dPi_K) C) — with dual update

    lambda <- Pi_{K*}(lambda - mu c)        (SURVEY.md §3.5 dual update law)

Gradient/Gauss-Newton Hessian of the penalty use the closed-form projection
Jacobians (cones.jl:129-188), chained through the constraint Jacobians and
scatter-added into the per-knot cost expansion — each constraint block is a
statically-shaped vmapped kernel over its knot-index set.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..cones import Cone, dualcone, projection, projection_jacobian, violation
from ..constraints import BoundConstraint, full_width_jacobian
from ..dynamics import DiscreteModel, rollout
from ..objective import Objective
from .ilqr import ILQRResult, ilqr_solve
from .options import SolverOptions

__all__ = ["ALSolution", "al_solve", "make_al_functions", "ConstraintBlock",
           "init_duals", "eval_blocks", "max_violation_blocks"]


@struct.dataclass
class ConstraintBlock:
    """One (constraint, knot-set) pair.

    ``con`` is the constraint pytree (arrays are leaves); ``inds`` the STATIC
    knot indices (constraint_list.jl:38-41) — static so block shapes and the
    scatter indices are trace-time constants.
    """

    con: Any
    inds: Tuple[int, ...] = struct.field(pytree_node=False)
    # Per-constraint derivative method (constraint_list.jl:40-41,103-106):
    # "ad" = jacfwd/analytic override (ForwardAD/UserDefined), "fd" =
    # central finite differences (FiniteDifference).  Static: resolves the
    # dispatch at trace time.
    diff_method: str = struct.field(pytree_node=False, default="ad")


@struct.dataclass
class SolveStats:
    """Per-outer-iteration history, accumulated IN-DEVICE (no host
    callbacks) — the reference solvers' ``stats`` log of cost, violation,
    and iteration counts (docs/old/solving.md 'Statistics';
    docs/old/solver_interface.md 'stats' field).

    Arrays have static length ``iterations_outer``; ``count`` marks the
    filled prefix.  Batched solves carry a leading scenario axis.
    """

    cost: jax.Array               # (O,)
    violation: jax.Array          # (O,)
    gradient: jax.Array           # (O,)
    inner_iterations: jax.Array   # (O,) int32, per-outer iLQR iterations
    penalty_max: jax.Array        # (O,) max penalty after the update
    count: jax.Array              # scalar int32: outer iterations recorded


@struct.dataclass
class ALSolution:
    xs: jax.Array
    us: jax.Array
    J: jax.Array                 # true (un-augmented) objective cost
    max_violation: jax.Array
    iterations: jax.Array        # total inner iLQR iterations
    outer_iterations: jax.Array
    gradient: jax.Array
    converged: jax.Array
    duals: Any                   # tuple of (K_i, p_i) dual arrays
    penalties: Any               # tuple of (K_i,) penalty scalars
    stats: Any = None            # SolveStats | None


def _contiguous(inds) -> bool:
    return list(inds) == list(range(inds[0], inds[-1] + 1))


def _take_knots(arr, inds):
    """arr[inds] along axis 0 — a STATIC slice when the knot set is
    contiguous (the overwhelmingly common case), avoiding TPU gathers."""
    if _contiguous(inds):
        return arr[inds[0]:inds[-1] + 1]
    return arr[jnp.array(inds)]


def _add_knots(arr, inds, upd):
    """arr.at[inds].add(upd) — as a static dense-slice update when the knot
    set is contiguous (XLA scatters are slow on TPU)."""
    if _contiguous(inds):
        return arr.at[inds[0]:inds[-1] + 1].add(upd)
    return arr.at[jnp.array(inds)].add(upd)


def _add_cols(arr, inds, upd):
    """arr.at[:, inds].add(upd) — static slice when the (static) column set
    is contiguous (e.g. control-only bounds in the z=[x;u] layout), else an
    index-array scatter."""
    if _contiguous(inds):
        return arr.at[:, inds[0]:inds[-1] + 1].add(upd)
    return arr.at[:, jnp.array(inds, dtype=int)].add(upd)


def _block_eval(block: ConstraintBlock, xs, us):
    """(K, p) constraint values over the block's knot set."""
    return jax.vmap(block.con.evaluate)(_take_knots(xs, block.inds),
                                        _take_knots(us, block.inds))


def _block_jac(block: ConstraintBlock, xs, us):
    # full-width (K, p, n+m) rows — narrow state-/control-only Jacobians
    # are zero-padded (constraints.full_width_jacobian)
    if block.diff_method == "fd":
        jac = block.con.jacobian_fd  # already full-width
    else:
        jac = lambda x, u: full_width_jacobian(block.con, x, u)
    return jax.vmap(jac)(
        _take_knots(xs, block.inds), _take_knots(us, block.inds))


def eval_blocks(blocks: Sequence[ConstraintBlock], xs, us):
    return tuple(_block_eval(b, xs, us) for b in blocks)


def max_violation_blocks(blocks: Sequence[ConstraintBlock], cvals) -> jax.Array:
    """max_violation over all constraints/knots (the constrained-solver
    interface method, docs/old/solver_interface.md)."""
    if not blocks:
        return jnp.zeros(())
    viols = [
        jnp.max(jax.vmap(lambda c: violation(b.con.sense, c))(c), initial=0.0)
        for b, c in zip(blocks, cvals)
    ]
    return jnp.stack(viols).max()


def init_duals(blocks: Sequence[ConstraintBlock], opts: SolverOptions, dtype):
    lams = tuple(
        jnp.zeros((len(b.inds), b.con.output_dim), dtype) for b in blocks
    )
    mus = tuple(
        jnp.full((len(b.inds),), opts.penalty_initial, dtype) for b in blocks
    )
    return lams, mus


def make_al_functions(obj: Objective, blocks: Sequence[ConstraintBlock],
                      lams, mus,
                      exact_hessian: bool = False) -> Tuple[Callable, Callable]:
    """Build (cost_fn, expand_fn) for the AL-augmented objective.

    ``exact_hessian=True`` adds the full-Newton curvature terms the
    Gauss-Newton default drops: the projection's second derivative
    mu * D^2Pi[pi] (cones.projection_hessian; cones.jl:201-276) and the
    constraint curvature sum_i (dphi/dc)_i nabla^2 c_i
    (constraints.constraint_hessian; abstract_constraint.jl:267-280).
    Exact curvature can be indefinite — the Riccati regularization handles
    it — and measures slower per iteration; GN is the production default.
    """

    def penalty_cost(block, lam, mu, xs, us):
        c = _block_eval(block, xs, us)                      # (K, p)
        dual = dualcone(block.con.sense)
        y = lam - mu[:, None] * c
        pi = jax.vmap(lambda v: projection(dual, v))(y)     # (K, p)
        per_knot = 0.5 * (jnp.sum(pi * pi, axis=-1) - jnp.sum(lam * lam, axis=-1)) / mu
        return jnp.sum(per_knot)

    def cost_fn(xs, us):
        J = obj.cost(xs, us)
        for block, lam, mu in zip(blocks, lams, mus):
            J = J + penalty_cost(block, lam, mu, xs, us)
        return J

    def expand_fn(xs, us):
        exp = obj.expansion(xs, us)
        n = xs.shape[-1]
        m_ = us.shape[-1]
        gx, gu = exp.x, exp.u
        Hxx, Huu, Hux = exp.xx, exp.uu, exp.ux
        for block, lam, mu in zip(blocks, lams, mus):
            inds = block.inds
            c = _block_eval(block, xs, us)                  # (K, p)
            dual = dualcone(block.con.sense)
            y = lam - mu[:, None] * c
            pi = jax.vmap(lambda v: projection(dual, v))(y)         # (K, p)

            if isinstance(block.con, BoundConstraint):
                # Bound rows are +-e_i: the chain rule reduces to dense
                # per-entry adds and a DIAGONAL Hessian add — no gathers,
                # no scatters, no (K, p, n+m) einsums.
                con = block.con
                act = (y <= 0).astype(xs.dtype)             # dPi diag (K, p)
                g_c = -act * pi                              # -dPi^T pi
                h_c = act * mu[:, None]                      # mu dPi^T dPi diag
                nu_, nl_ = len(con.i_max), len(con.i_min)
                gz = jnp.zeros((len(inds), n + m_), xs.dtype)
                hz = jnp.zeros_like(gz)
                if nu_:
                    gz = _add_cols(gz, con.i_max, g_c[:, :nu_])   # J row = +1
                    hz = _add_cols(hz, con.i_max, h_c[:, :nu_])
                if nl_:
                    gz = _add_cols(gz, con.i_min, -g_c[:, nu_:])  # J row = -1
                    hz = _add_cols(hz, con.i_min, h_c[:, nu_:])
                gx = _add_knots(gx, inds, gz[:, :n])
                gu = _add_knots(gu, inds, gz[:, n:])
                eye_n = jnp.eye(n, dtype=xs.dtype)
                eye_m = jnp.eye(m_, dtype=xs.dtype)
                Hxx = _add_knots(Hxx, inds, hz[:, :n, None] * eye_n[None])
                Huu = _add_knots(Huu, inds, hz[:, n:, None] * eye_m[None])
                continue

            Jc = _block_jac(block, xs, us)                  # (K, p, n+m)
            dpi = jax.vmap(lambda v: projection_jacobian(dual, v))(y)  # (K, p, p)
            # grad wrt c: -dPi^T pi ; GN Hessian wrt c: mu * dPi^T dPi
            g_c = -jnp.einsum("kpq,kp->kq", dpi, pi)
            g_z = jnp.einsum("kpz,kp->kz", Jc, g_c)                  # (K, n+m)
            H_c = jnp.einsum("kpq,kpr->kqr", dpi, dpi) * mu[:, None, None]
            if exact_hessian:
                # mu * D^2Pi[pi]: second derivative of the dual-cone
                # projection contracted with pi (zero for the orthant
                # cones, the SOC closed form otherwise)
                from ..cones import projection_hessian
                Hpi = jax.vmap(
                    lambda v, p_: projection_hessian(dual, v, p_))(y, pi)
                H_c = H_c + mu[:, None, None] * Hpi
            H_z = jnp.einsum("kpz,kpq,kqw->kzw", Jc, H_c, Jc)        # (K, n+m, n+m)
            if exact_hessian:
                # constraint curvature sum_i (dphi/dc)_i nabla^2 c_i
                from ..constraints import constraint_hessian
                H_z = H_z + jax.vmap(
                    lambda x_, u_, g_: constraint_hessian(
                        block.con, x_, u_, g_))(
                        _take_knots(xs, inds), _take_knots(us, inds), g_c)
            gx = _add_knots(gx, inds, g_z[:, :n])
            gu = _add_knots(gu, inds, g_z[:, n:])
            Hxx = _add_knots(Hxx, inds, H_z[:, :n, :n])
            Huu = _add_knots(Huu, inds, H_z[:, n:, n:])
            Hux = _add_knots(Hux, inds, H_z[:, n:, :n])
        return exp.replace(x=gx, u=gu, xx=Hxx, uu=Huu, ux=Hux)

    return cost_fn, expand_fn


def update_duals(blocks, lams, mus, cvals, opts: SolverOptions):
    """lambda <- clamp(Pi_{K*}(lambda - mu c)) (SURVEY.md §3.5)."""
    new = []
    for block, lam, mu, c in zip(blocks, lams, mus, cvals):
        dual = dualcone(block.con.sense)
        y = lam - mu[:, None] * c
        lam_n = jax.vmap(lambda v: projection(dual, v))(y)
        lam_n = jnp.clip(lam_n, -opts.dual_max, opts.dual_max)
        new.append(lam_n)
    return tuple(new)


def update_penalties(mus, opts: SolverOptions):
    """mu <- min(penalty_scaling * mu, penalty_max) (docs/old/solving.md)."""
    return tuple(jnp.minimum(mu * opts.penalty_scaling, opts.penalty_max)
                 for mu in mus)


def al_solve(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x0: jax.Array,
    us_init: jax.Array,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    xs_init: jax.Array = None,
    duals_init=None,
    penalties_init=None,
) -> ALSolution:
    """AL-iLQR solve (the ALTRO phase-1 loop, SURVEY.md §3.5).

    Fully jittable and vmappable over scenarios: all control flow is
    ``lax.while_loop`` with per-scenario convergence state.  ``duals_init``/
    ``penalties_init`` warm-start the multipliers (MPC re-solves,
    SURVEY.md §5 checkpoint/warm-start analog).
    """
    blocks = tuple(blocks)
    dtype = us_init.dtype
    # Ensure dynamic feasibility: rollout from x0 (the reference examples
    # call rollout! before solve; problem.jl:330-340).
    xs_roll = rollout(model, x0, us_init, times, dts)
    xs0 = xs_seed = xs_roll
    if xs_init is not None:
        # A finite state guess always seeds the initial ITERATE (the first
        # backward pass linearizes around it and the closed-loop forward
        # rollout tracks it — the state-guess seeding that threads e.g.
        # the 120-obstacle dubins_escape corridor).  But only a
        # DYNAMICALLY-CONSISTENT guess may seed the best-iterate backstop
        # and the cost/violation baselines: an un-rolled guess is
        # constraint-feasible and artificially cheap, and the Pareto
        # backstop could hand it back as a "converged" solution (caught r5
        # with a DIRCOL warm start whose Hermite-Simpson trajectory is not
        # an RK4 rollout — reported J 22% below the true transcription
        # optimum).  Shifted MPC trajectories and PN outputs sit far below
        # the defect threshold.
        finite = jnp.all(jnp.isfinite(xs_init))
        xs0 = jnp.where(finite, xs_init, xs_roll)
        pred = jax.vmap(model.step)(xs_init[:-1], us_init[:-1],
                                    times[:-1], dts[:-1])
        defect = jnp.max(jnp.abs(pred - xs_init[1:]))
        # non-finite guesses (solve_problem's NaN default) fall back to
        # the rollout, which IS consistent — only a finite-but-
        # inconsistent guess needs the special handling below
        guess_ok = (~finite) | (defect <= opts.warm_start_defect_tolerance)
        xs_seed = jnp.where(finite & guess_ok, xs_init, xs_roll)
    else:
        guess_ok = jnp.array(True)

    lams, mus = init_duals(blocks, opts, dtype)
    if duals_init is not None:
        lams = duals_init
    if penalties_init is not None:
        mus = penalties_init

    O = int(opts.iterations_outer)

    def _empty_stats():
        if not opts.record_stats:
            return None
        return SolveStats(
            cost=jnp.zeros((O,), dtype), violation=jnp.zeros((O,), dtype),
            gradient=jnp.zeros((O,), dtype),
            inner_iterations=jnp.zeros((O,), jnp.int32),
            penalty_max=jnp.zeros((O,), dtype),
            count=jnp.zeros((), jnp.int32),
        )

    if not blocks:
        res = ilqr_solve(model, obj.cost, obj.expansion, x0, xs0, us_init,
                         times, dts, opts)
        stats0 = _empty_stats()
        if stats0 is not None:
            stats0 = stats0.replace(
                cost=stats0.cost.at[0].set(res.J),
                gradient=stats0.gradient.at[0].set(res.gradient),
                inner_iterations=stats0.inner_iterations.at[0].set(
                    res.iterations),
                count=jnp.ones((), jnp.int32),
            )
        return ALSolution(
            xs=res.xs, us=res.us, J=res.J, max_violation=jnp.zeros((), dtype),
            iterations=res.iterations, outer_iterations=jnp.zeros((), jnp.int32),
            gradient=res.gradient, converged=res.converged, duals=lams,
            penalties=mus, stats=stats0,
        )

    class Carry(NamedTuple):
        xs: jax.Array
        us: jax.Array
        lams: Any
        mus: Any
        J: jax.Array
        viol: jax.Array
        grad: jax.Array
        inner_iters: jax.Array
        outer: jax.Array
        converged: jax.Array
        failed: jax.Array
        best_xs: jax.Array
        best_us: jax.Array
        best_J: jax.Array
        best_viol: jax.Array
        stats: Any

    def cond(s: Carry):
        return (~s.converged) & (s.outer < opts.iterations_outer) \
            & (s.inner_iters < opts.iterations)

    tol = opts.constraint_tolerance

    def body(s: Carry):
        cost_fn, expand_fn = make_al_functions(
            obj, blocks, s.lams, s.mus,
            exact_hessian=opts.al_hessian_exact)
        # Merit baseline for the inner solve: an inconsistent state guess
        # (outer 0 only) is a REFERENCE for the first backward pass, not a
        # comparable iterate — its merit is not commensurate with rollout
        # merits in either direction (a feasible foreign-transcription
        # guess reads artificially cheap and blocks every move; a rollout
        # baseline blocks guess-tracking trials whose true cost is higher
        # than the do-nothing rollout's).  Baseline at +inf instead: the
        # monotone fallback then accepts the best SANE trial on iteration
        # 1 (a genuine closed-loop rollout tracking the guess), and normal
        # descent logic resumes from that real trajectory.
        if xs_init is None:
            J0_init = None
        else:
            J0_init = jnp.where(
                guess_ok | (s.outer > 0),
                cost_fn(s.xs, s.us), jnp.asarray(jnp.inf, dtype))
        res = ilqr_solve(
            model, cost_fn, expand_fn, x0, s.xs, s.us, times, dts, opts,
            max_iters=opts.iterations_inner,
            cost_tol=opts.cost_tolerance_intermediate,
            grad_tol=opts.gradient_tolerance_intermediate,
            J0_init=J0_init,
        )
        cvals = eval_blocks(blocks, res.xs, res.us)
        viol = max_violation_blocks(blocks, cvals)
        J_true = obj.cost(res.xs, res.us)

        # -- divergence safeguard (outer-iterate rejection) ------------------
        # An inner solve can descend the weakly-penalized AL merit into an
        # iterate far outside the constraint set and wedge there (the line
        # search then cannot move, and duals/penalties computed at such an
        # iterate are garbage that no later outer iteration recovers from).
        # When the violation blows up past any plausible AL excursion —
        # relative to the best violation seen or in absolute terms —
        # REJECT the step: keep the previous (accepted) iterate, keep the
        # old duals, and force a penalty escalation so the next inner solve
        # sees a stiffer (better-conditioned) subproblem from a sane start.
        reject = opts.al_safeguard & (
            (viol > jnp.maximum(opts.al_reject_ratio * s.best_viol,
                                jnp.asarray(opts.al_reject_floor, dtype)))
            | ~jnp.isfinite(viol))

        lams_upd = update_duals(blocks, s.lams, s.mus, cvals, opts)
        lams_n = jax.tree_util.tree_map(
            lambda old, new: jnp.where(reject, old, new), s.lams, lams_upd)
        converged = (~reject) & (viol < tol)
        if xs_init is not None:
            # an inconsistent guess the inner solver never moved off is
            # not a solution (defect-guard belt: it satisfies the
            # constraint blocks but not the dynamics).  Compare against
            # the ORIGINAL guess: the iterate can sit on it across outers.
            on_guess = jnp.all(res.xs == xs_init)
            converged = converged & (guess_ok | ~on_guess)
        # Scale penalties only while infeasible, and (conditional/Bertsekas
        # update) only when the violation is not already shrinking fast
        # enough for dual updates alone.  A rejected step ALWAYS escalates.
        if opts.penalty_conditional:
            keep = converged | (
                (~reject) & (viol < opts.penalty_conditional_ratio * s.viol))
        else:
            keep = converged
        mus_n = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, old, new),
            update_penalties(s.mus, opts), s.mus,
        )
        xs_n = jnp.where(reject, s.xs, res.xs)
        us_n = jnp.where(reject, s.us, res.us)
        J_n = jnp.where(reject, s.J, J_true)
        viol_n = jnp.where(reject, s.viol, viol)
        # Best-iterate backstop, PARETO ordering: update only when the new
        # iterate dominates (no worse in BOTH violation and cost, strictly
        # better in one).  Cost comparisons across different feasibility
        # levels are meaningless (less feasible usually means cheaper), so
        # domination is the only safe total refinement; the exit guard
        # below uses it purely as a second line of defense.
        better = (~reject) & (viol <= s.best_viol) & (J_true <= s.best_J) \
            & ((viol < s.best_viol) | (J_true < s.best_J))
        best_xs = jnp.where(better, res.xs, s.best_xs)
        best_us = jnp.where(better, res.us, s.best_us)
        best_J = jnp.where(better, J_true, s.best_J)
        best_viol = jnp.where(better, viol, s.best_viol)
        if opts.record_stats:
            mu_max = jnp.max(jnp.stack([jnp.max(mu) for mu in mus_n]))
            i = jnp.minimum(s.outer, O - 1)
            stats_n = s.stats.replace(
                cost=s.stats.cost.at[i].set(J_true),
                violation=s.stats.violation.at[i].set(viol),
                gradient=s.stats.gradient.at[i].set(res.gradient),
                inner_iterations=s.stats.inner_iterations.at[i].set(
                    res.iterations),
                penalty_max=s.stats.penalty_max.at[i].set(mu_max),
                count=s.outer + 1,
            )
        else:
            stats_n = None
        return Carry(
            xs=xs_n, us=us_n, lams=lams_n, mus=mus_n, J=J_n, viol=viol_n,
            grad=res.gradient, inner_iters=s.inner_iters + res.iterations,
            outer=s.outer + 1, converged=converged,
            failed=res.failed & (~reject),
            best_xs=best_xs, best_us=best_us, best_J=best_J,
            best_viol=best_viol, stats=stats_n,
        )

    # Baselines and the best-iterate backstop seed from the CONSISTENT
    # trajectory (xs_seed): see the warm-start defect guard above.
    J_init = obj.cost(xs_seed, us_init)
    viol_init = max_violation_blocks(
        blocks, eval_blocks(blocks, xs_seed, us_init))
    init = Carry(
        xs=xs0, us=us_init, lams=lams, mus=mus,
        J=J_init,
        viol=jnp.full((), jnp.inf, dtype),
        grad=jnp.full((), jnp.inf, dtype),
        inner_iters=jnp.zeros((), jnp.int32),
        outer=jnp.zeros((), jnp.int32),
        converged=jnp.array(False),
        failed=jnp.array(False),
        best_xs=xs_seed, best_us=us_init, best_J=J_init,
        best_viol=viol_init.astype(dtype),
        stats=_empty_stats(),
    )
    out = jax.lax.while_loop(cond, body, init)

    def _best_guard(xs_f, us_f, J_f, viol_f, grad_f, conv_f):
        """Second line of defense: return the best-so-far iterate when it
        PARETO-dominates an infeasible final one (in-loop rejection already
        keeps diverged iterates out of the carry; this only catches gradual
        non-monotone drift, e.g. violation creeping up at saturated mu)."""
        swap = jnp.array(False)
        if xs_init is not None:
            # defect-guard: never RETURN the raw inconsistent guess — if
            # the solve ends still sitting on it (closed-loop seeding can
            # fail to move off a constraint-feasible foreign-transcription
            # guess), hand back the best CONSISTENT iterate instead,
            # unconverged.
            swap = (~guess_ok) & jnp.all(xs_f == xs_init)
        if not opts.al_safeguard:
            return (jnp.where(swap, out.best_xs, xs_f),
                    jnp.where(swap, out.best_us, us_f),
                    jnp.where(swap, out.best_J, J_f),
                    jnp.where(swap, out.best_viol, viol_f),
                    grad_f, conv_f & ~swap)
        worse = swap | ((viol_f > tol) & (out.best_viol <= viol_f)
                        & (out.best_J <= J_f)
                        & ((out.best_viol < viol_f) | (out.best_J < J_f)))
        return (
            jnp.where(worse, out.best_xs, xs_f),
            jnp.where(worse, out.best_us, us_f),
            jnp.where(worse, out.best_J, J_f),
            jnp.where(worse, out.best_viol, viol_f),
            grad_f,
            conv_f & ~worse,
        )

    if not opts.final_polish:
        xs_f, us_f, J_f, viol_f, grad_f, conv_f = _best_guard(
            out.xs, out.us, out.J, out.viol, out.grad, out.converged)
        return ALSolution(
            xs=xs_f, us=us_f, J=J_f, max_violation=viol_f,
            iterations=out.inner_iters, outer_iterations=out.outer,
            gradient=grad_f, converged=conv_f,
            duals=out.lams, penalties=out.mus, stats=out.stats,
        )

    # Final polish: one more inner solve at the tight tolerance with the
    # converged duals (Altro runs the last AL solve to cost_tolerance).
    # The polish minimizes the AL merit at FIXED multipliers, which can
    # trade a little feasibility for cost — keep it only if it does not
    # worsen the max violation beyond tolerance.
    cost_fn, expand_fn = make_al_functions(
        obj, blocks, out.lams, out.mus,
        exact_hessian=opts.al_hessian_exact)
    res = ilqr_solve(
        model, cost_fn, expand_fn, x0, out.xs, out.us, times, dts, opts,
        max_iters=opts.iterations_inner,
        cost_tol=opts.cost_tolerance,
        grad_tol=opts.gradient_tolerance,
    )
    cvals = eval_blocks(blocks, res.xs, res.us)
    viol_p = max_violation_blocks(blocks, cvals)
    keep = viol_p <= jnp.maximum(out.viol, opts.constraint_tolerance)
    xs_f = jnp.where(keep, res.xs, out.xs)
    us_f = jnp.where(keep, res.us, out.us)
    viol_f = jnp.where(keep, viol_p, out.viol)
    grad_f = jnp.where(keep, res.gradient, out.grad)
    # The polish IS one more inner solve at the tight tolerance (Altro's
    # final AL solve): a scenario it lands inside tolerance counts as
    # converged even if the outer loop's own budget expired first.
    conv_f = (out.converged | (keep & ~res.failed)) & (
        viol_f < opts.constraint_tolerance)
    if xs_init is not None:
        # defect-guard belt (see body): the raw inconsistent guess can
        # survive to here through the polish's keep path
        conv_f = conv_f & (guess_ok | ~jnp.all(xs_f == xs_init))
    xs_f, us_f, J_f, viol_f, grad_f, conv_f = _best_guard(
        xs_f, us_f, obj.cost(xs_f, us_f), viol_f, grad_f, conv_f)
    return ALSolution(
        xs=xs_f, us=us_f, J=J_f,
        max_violation=viol_f,
        iterations=out.inner_iters + res.iterations,
        outer_iterations=out.outer,
        gradient=grad_f,
        converged=conv_f,
        duals=out.lams, penalties=out.mus, stats=out.stats,
    )
