"""Projected-Newton solution polish (ALTRO phase 2).

The reference's solver stack finishes with a projected-Newton phase that
polishes the AL solution to tight feasibility (docs/old/solvers.md: "ALTRO";
SURVEY.md §3.5).  TPU-native design: the active-constraint/defect system is
never materialized dense.  Rows are grouped by knot — group k holds the
dynamics defect for interval k plus the active stage-constraint rows at knot
k — so each group touches only the two adjacent variable blocks
w_{k-1} = (u_{k-1}, x_k) and w_k = (u_k, x_{k+1}) (x_0 is pinned).  The
normal-equations matrix D D^T is therefore block TRIDIAGONAL in (q, q)
knot blocks (q = n + total stage rows), and the minimum-norm Newton step

    dz = -D^T (D D^T + eps I)^(-1) r

is computed with a block-tridiagonal Cholesky: three O(N) ``lax.scan``s
(factor, forward, backward) over (q, q) blocks instead of one dense
O((N q)^3) factorization — the same sequential-over-knots, batched-over-
scenarios shape as the Riccati recursion, with O(1) trace size (the r1
version assembled the dense Jacobian with N unrolled scatter loops;
VERDICT r1 #6).

Equality and inequality (active-set) rows participate; SECOND_ORDER blocks
participate through ONE scalarized boundary row ||v|| - s per knot (active
at/beyond the cone boundary), so SOCP solutions polish to direct-solver
feasibility grades instead of stopping at AL tolerance (VERDICT r2 #7;
cones.jl:129-188 is the cone geometry being linearized).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..cones import Cone
from ..constraints import full_width_jacobian
from ..dynamics import DiscreteModel
from ..objective import Objective
from .al import (ALSolution, ConstraintBlock, _take_knots, eval_blocks,
                 max_violation_blocks)
from .options import SolverOptions

__all__ = ["projected_newton"]


def _set_knots(arr, inds, upd):
    """arr.at[inds].set(upd) with a static dense slice for contiguous knot
    sets (XLA scatters are slow on TPU; al.py `_add_knots`)."""
    inds = list(inds)
    if inds == list(range(inds[0], inds[-1] + 1)):
        return arr.at[inds[0]:inds[-1] + 1].set(upd)
    return arr.at[jnp.array(inds)].set(upd)


# Unrolled small-matrix routines keep the scan bodies pure broadcast
# arithmetic (no solve_triangular/cholesky custom calls -> no per-step
# relayouts in batch-minor layouts; see SolverOptions.riccati_body), but
# their trace size is O(q^2)-O(q^3): beyond this block size compilation
# explodes (dubins_escape's 120 obstacle rows -> q ~ 125), so large
# systems keep the LAPACK-style custom calls.
_UNROLL_MAX_Q = 40


def _tri_solve(L, b):
    """Solve L y = b (lower triangular); b is (q,) or (q, k)."""
    if L.shape[-1] <= _UNROLL_MAX_Q:
        from ..utils.linalg import tri_solve_small
        return tri_solve_small(L, b)
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def _tri_solve_t(L, b):
    """Solve L^T y = b."""
    if L.shape[-1] <= _UNROLL_MAX_Q:
        from ..utils.linalg import tri_solve_small
        return tri_solve_small(L, b, trans=True)
    return jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1)


def _mm_t(X, Y):
    """X @ Y^T via multiply+reduce (riccati_body lesson: batched tiny
    dot_generals inside scans force per-step relayouts)."""
    return jnp.sum(X[..., :, None, :] * Y[..., None, :, :], axis=-1)


def _mv(M, v):
    return jnp.sum(M * v[..., None, :], axis=-1)


def _mtv(M, v):
    return jnp.sum(M * v[..., :, None], axis=-2)


def projected_newton(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x0: jax.Array,
    sol: ALSolution,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    newton_iters: int = 3,
    active_tol: float = 1e-3,
    reg: float = 1e-10,
    rescue=False,
) -> ALSolution:
    """Polish ``sol`` to tight feasibility with minimum-norm Newton
    projections onto {dynamics defects = 0, active constraints = 0}.

    ``rescue``: a bool (or traced bool array) asserting the AL phase made
    genuine progress (see altro.altro_solve).  When set, a polished iterate
    inside tolerance counts as converged even if the AL loop's own
    convergence flag never fired — the reference's ALTRO semantics, where
    phase 2 is what achieves tight feasibility after the AL phase stalls
    near the solution (docs/old/solvers.md).  Without it PN can only
    UN-set convergence (a polish that fails to reach tolerance)."""
    N, n = sol.xs.shape
    m = sol.us.shape[-1]
    dtype = sol.xs.dtype
    # Row layout: orthant/equality blocks contribute their full rows; a
    # SECOND_ORDER block c = [v; s] contributes ONE scalarized boundary row
    # g = ||v|| - s  (<= 0; active at/beyond the cone boundary), with
    # gradient (v/||v||)^T Jv - Js — the same smooth scalarization the
    # direct solver uses (nlp.solve_nlp), so rocket-grade SOCPs polish to
    # ~1e-8+ instead of stopping at AL tolerance (cones.jl:129-188).
    stage = list(blocks)
    offs, P = [], 0
    for b in stage:
        offs.append(P)
        P += 1 if b.con.sense is Cone.SECOND_ORDER else b.con.output_dim
    q = n + P           # rows per knot group (defect block + stage slab)
    w = m + n           # variable block w_k = (u_k, x_{k+1})

    def build_system(xs, us, hold_tol):
        """E (N, q, w), F (N, q, w), r (N, q): group k's coefficients on
        w_{k-1} and w_k and its residual, with inactive rows zeroed.
        ``hold_tol``: inequality rows within this distance BELOW the
        boundary are included with zero residual (held)."""
        A, B = jax.vmap(model.jacobian)(xs[:-1], us[:-1], times[:-1],
                                        dts[:-1])
        defects = jax.vmap(model.step)(xs[:-1], us[:-1], times[:-1],
                                       dts[:-1]) - xs[1:]

        E = jnp.zeros((N, q, w), dtype)
        F = jnp.zeros((N, q, w), dtype)
        r = jnp.zeros((N, q), dtype)
        live = jnp.zeros((N, q), bool)   # structurally-present rows

        # defect rows [0:n): E_k = [0 | A_k] (1 <= k <= N-2), F_k = [B_k | -I]
        E = E.at[1:N - 1, :n, m:].set(A[1:])
        F = F.at[:-1, :n, :m].set(B)
        eye_n = jnp.eye(n, dtype=dtype)
        F = F.at[:-1, :n, m:].set(-jnp.broadcast_to(eye_n, (N - 1, n, n)))
        r = r.at[:-1, :n].set(defects)
        live = live.at[:-1, :n].set(True)

        # stage rows: block b occupies rows [n+off : n+off+p) at its knots
        for b, off in zip(stage, offs):
            p = b.con.output_dim
            ks = b.inds
            c = jax.vmap(b.con.evaluate)(_take_knots(xs, ks),
                                         _take_knots(us, ks))      # (K, p)
            Jc = jax.vmap(lambda x, u: full_width_jacobian(b.con, x, u))(
                _take_knots(xs, ks), _take_knots(us, ks))          # (K,p,n+m)
            if b.con.sense is Cone.SECOND_ORDER:
                # scalarize [v; s] -> g = ||v|| - s (one row); the gradient
                # epsilon is dtype-aware (f32 round-off of ||v||^2 swamps a
                # fixed 1e-16 near the cone apex — ADVICE r3)
                v, s_ = c[:, :-1], c[:, -1]
                eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
                nv = jnp.sqrt(jnp.sum(v * v, axis=-1) + eps * eps)  # (K,)
                g = nv - s_
                Jg = (jnp.einsum("kp,kpz->kz", v / nv[:, None], Jc[:, :-1])
                      - Jc[:, -1])                                  # (K, n+m)
                c = g[:, None]
                Jc = Jg[:, None, :]
                p = 1
                act = (c > -hold_tol)
                c = jnp.maximum(c, 0.0)
            elif b.con.sense is Cone.ZERO:
                act = jnp.ones_like(c, bool)
            else:
                # NegativeOrthant active set: violated rows (c > 0) are
                # driven to the boundary; rows within hold_tol BELOW the
                # boundary are included with residual max(c, 0) = 0 — they
                # are held, not pulled out — so the min-norm correction
                # cannot re-violate a just-projected row (active-set
                # chatter kept bound rows at ~1e-8 otherwise).  The final
                # pass runs violated-only (hold_tol = 0): held rows
                # micro-chatter at ~1e-10, and the last tiny correction is
                # chatter-free.
                act = c > -hold_tol
                c = jnp.maximum(c, 0.0)
            sl = slice(n + off, n + off + p)
            # x-part lands in E (zero where knot 0: x_0 pinned)
            Ex = Jc[:, :, :n]
            if ks[0] == 0:
                Ex = Ex.at[0].set(0.0)
            E = E.at[:, sl, m:].set(
                _set_knots(jnp.zeros((N, p, n), dtype), b.inds, Ex))
            # u-part lands in F (zero at the terminal knot: no u there)
            Ju = Jc[:, :, n:]
            if ks[-1] == N - 1:
                Ju = Ju.at[-1].set(0.0)
            F = F.at[:, sl, :m].set(
                _set_knots(jnp.zeros((N, p, m), dtype), b.inds, Ju))
            r = r.at[:, sl].set(_set_knots(jnp.zeros((N, p), dtype),
                                           b.inds, c))
            live = live.at[:, sl].set(_set_knots(jnp.zeros((N, p), bool),
                                                 b.inds, act))

        maskf = live.astype(dtype)[:, :, None]
        E = E * maskf
        F = F * maskf
        r = jnp.where(live, r, 0.0)
        return E, F, r, live

    def min_norm_step(E, F, r, live):
        """dz = -D^T (D D^T)^(-1) r via block-tridiagonal Cholesky."""
        # diagonal blocks; dead rows get a unit pivot (their residual is 0)
        Gd = jnp.einsum("kqw,kpw->kqp", E, E) + jnp.einsum(
            "kqw,kpw->kqp", F, F)
        Gd = Gd + jax.vmap(jnp.diag)(jnp.where(live, reg, 1.0))
        # sub-diagonal blocks: group k couples to group k-1 through w_{k-1}
        Go = jnp.einsum("kqw,kpw->kqp", E[1:], F[:-1])        # (N-1, q, q)
        Go = jnp.concatenate([jnp.zeros((1, q, q), dtype), Go], axis=0)

        def fact(L_prev, inp):
            Gd_k, Go_k = inp
            M_k = jnp.swapaxes(
                _tri_solve(L_prev, jnp.swapaxes(Go_k, -1, -2)), -1, -2)
            S = Gd_k - _mm_t(M_k, M_k)
            if S.shape[-1] <= _UNROLL_MAX_Q:
                from ..utils.linalg import chol_small
                L_k, _ = chol_small(S)
            else:
                L_k = jnp.linalg.cholesky(S)
            return L_k, (L_k, M_k)

        # group 0 has no coupling: seed the scan with an identity "L_{-1}"
        _, (L, M) = jax.lax.scan(fact, jnp.eye(q, dtype=dtype), (Gd, Go))

        def fwd(y_prev, inp):
            L_k, M_k, r_k = inp
            y_k = _tri_solve(L_k, r_k - _mv(M_k, y_prev))
            return y_k, y_k

        _, yhat = jax.lax.scan(fwd, jnp.zeros((q,), dtype), (L, M, r))

        def bwd(y_next, inp):
            L_k, M_next, yhat_k = inp
            y_k = _tri_solve_t(L_k, yhat_k - _mtv(M_next, y_next))
            return y_k, y_k

        M_next = jnp.concatenate([M[1:], jnp.zeros((1, q, q), dtype)], axis=0)
        _, y = jax.lax.scan(bwd, jnp.zeros((q,), dtype),
                            (L, M_next, yhat), reverse=True)

        # dw_k = -(F_k^T y_k + E_{k+1}^T y_{k+1}), k = 0..N-2
        dw = -(jnp.einsum("kqw,kq->kw", F[:-1], y[:-1])
               + jnp.einsum("kqw,kq->kw", E[1:], y[1:]))
        return dw                                           # (N-1, m+n)

    def newton_step(carry, hold_tol):
        xs, us = carry
        E, F, r, live = build_system(xs, us, hold_tol)
        dw = min_norm_step(E, F, r, live)
        us_n = jnp.concatenate([us[:-1] + dw[:, :m], us[-1:]], axis=0)
        xs_n = jnp.concatenate([xs[:1], xs[1:] + dw[:, m:]], axis=0)
        return (xs_n, us_n), jnp.max(jnp.abs(r))

    hold = jnp.concatenate([jnp.full((newton_iters,), active_tol, dtype),
                            jnp.zeros((1,), dtype)])
    (xs, us), _ = jax.lax.scan(newton_step, (sol.xs, sol.us), hold)
    cvals = eval_blocks(blocks, xs, us)
    viol = max_violation_blocks(blocks, cvals)
    # include dynamics defect in the reported violation
    defect = jnp.max(jnp.abs(
        jax.vmap(model.step)(xs[:-1], us[:-1], times[:-1], dts[:-1]) - xs[1:]))
    viol = jnp.maximum(viol, defect)
    # -- keep-guard (VERDICT r3 #2): a polish phase must never make the
    # answer worse.  On near-singular active sets (e.g. many simultaneously
    # held obstacle rows) the min-norm normal equations can explode the
    # step; accept the polished iterate only if it does not worsen the max
    # violation beyond max(incoming, tol) and the cost does not blow up —
    # the same pattern as al.py's final_polish keep.  A rejected polish
    # returns the AL iterate untouched (and cannot "rescue" convergence).
    J_p = obj.cost(xs, us)
    tol = jnp.asarray(opts.constraint_tolerance, dtype)
    # Like-for-like incoming violation: sol.max_violation from the AL phase
    # excludes dynamics defects (its iterates are rollouts, defect ~ 0),
    # but a standalone-PN seed (user/DIRCOL trajectory) may carry real
    # defects that the polish is precisely there to close.
    defect_in = jnp.max(jnp.abs(
        jax.vmap(model.step)(sol.xs[:-1], sol.us[:-1], times[:-1],
                             dts[:-1]) - sol.xs[1:]))
    viol_in = jnp.maximum(sol.max_violation, defect_in)
    keep = (
        jnp.isfinite(viol) & jnp.isfinite(J_p)
        & (viol <= jnp.maximum(viol_in, tol))
        & (J_p <= sol.J + jnp.maximum(0.25 * jnp.abs(sol.J), 1.0))
    )
    xs_f = jnp.where(keep, xs, sol.xs)
    us_f = jnp.where(keep, us, sol.us)
    viol_f = jnp.where(keep, viol, sol.max_violation)
    J_f = jnp.where(keep, J_p, sol.J)
    return sol.replace(
        xs=xs_f, us=us_f, J=J_f, max_violation=viol_f,
        converged=(sol.converged | (jnp.asarray(rescue) & keep))
        & (viol_f < opts.constraint_tolerance),
    )
