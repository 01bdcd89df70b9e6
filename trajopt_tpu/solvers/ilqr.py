"""iLQR: Riccati backward pass + closed-loop forward pass with line search.

The inner unconstrained solver of the AL-iLQR/ALTRO stack (SURVEY.md §3.5;
/root/reference/docs/old/solvers.md: iLQR < AugmentedLagrangian < ALTRO).

TPU-first design notes:
  * The backward Riccati recursion is a single ``lax.scan`` over the knot
    axis with (n+m)-sized dense blocks — small matrices that batch across
    thousands of scenarios under ``vmap`` (the scenario axis is where the
    hardware parallelism lives; see parallel/batch.py).
  * Regularization failure (non-PD Quu) does not branch per knot: the scan
    carries a failure flag, and a ``lax.while_loop`` around the whole pass
    re-runs it with a larger rho — the Tassa-style delta-doubling schedule.
  * The forward pass is a ``lax.scan`` rollout nested in a
    ``lax.while_loop`` backtracking line search on the expected-decrease
    ratio z = dJ / (-alpha*dV1 - alpha^2*dV2).
  * The cost/expansion callables are injected, so the same machine solves
    the raw objective (iLQR) and the AL-augmented objective (AL-iLQR).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics import DiscreteModel
from ..utils.linalg import chol_small, chol_solve_small
from .options import SolverOptions

__all__ = ["ilqr_solve", "ILQRResult"]


@struct.dataclass
class ILQRResult:
    xs: jax.Array
    us: jax.Array
    J: jax.Array
    iterations: jax.Array
    gradient: jax.Array
    dJ: jax.Array
    rho: jax.Array
    stall_count: jax.Array  # consecutive iterations with no real progress
    converged: jax.Array
    failed: jax.Array  # regularization or line-search breakdown


class _BackwardOut(NamedTuple):
    K: jax.Array  # (N-1, m, n)
    d: jax.Array  # (N-1, m)
    dV1: jax.Array
    dV2: jax.Array
    rho: jax.Array
    drho: jax.Array
    fail: jax.Array


def _use_errstate(model: DiscreteModel, opts: SolverOptions) -> bool:
    return opts.error_state and model.model.errstate_dim != model.n


# -- structured error-state transforms (Model.errstate_block) ---------------
# E(x) = blockdiag(I_{r0}, G(x), I_{n-r1}); all three helpers apply the
# transform with static slice concats + one tiny G contraction instead of
# dense (n, nt) einsums — no E tensor is ever materialized.

def _es_rows(G, M, r0, r1):
    """E(x)^T M along axis -2 (G: (k, p, q), M: (k, n, j))."""
    return jnp.concatenate([
        M[..., :r0, :],
        jnp.einsum("kpq,kpj->kqj", G, M[..., r0:r1, :]),
        M[..., r1:, :]], axis=-2)


def _es_cols(G, M, r0, r1):
    """M E(x) along axis -1 (G: (k, p, q), M: (k, i, n))."""
    return jnp.concatenate([
        M[..., :r0],
        jnp.einsum("kip,kpq->kiq", M[..., r0:r1], G),
        M[..., r1:]], axis=-1)


def _es_vec(G, v, r0, r1):
    """E(x)^T v (G: (k, p, q), v: (k, n))."""
    return jnp.concatenate([
        v[..., :r0],
        jnp.einsum("kpq,kp->kq", G, v[..., r0:r1]),
        v[..., r1:]], axis=-1)


# "mulsum" variants: same math as the einsum forms, expressed as
# broadcast-multiply + sum.  dot_general MATERIALIZES its operands in the
# TPU's padded (8, 128)-tiled layout — and for these tiny last dims (3, 4,
# 12, 13 lanes all pad to 128) each materialization costs ~8-40x its
# logical bytes; multiply/reduce lower to elementwise+reduce fusions XLA
# can keep entirely in registers/VMEM inside the surrounding loop fusion.

def _es_rows_ms(G, M, r0, r1):
    mid = jnp.sum(G[..., :, :, None] * M[..., r0:r1, None, :], axis=-3)
    return jnp.concatenate([M[..., :r0, :], mid, M[..., r1:, :]], axis=-2)


def _es_cols_ms(G, M, r0, r1):
    mid = jnp.sum(M[..., r0:r1, None] * G[..., None, :, :], axis=-2)
    return jnp.concatenate([M[..., :r0], mid, M[..., r1:]], axis=-1)


def _es_vec_ms(G, v, r0, r1):
    mid = jnp.sum(G * v[..., r0:r1, None], axis=-2)
    return jnp.concatenate([v[..., :r0], mid, v[..., r1:]], axis=-1)


def _dense_E(G, n, r0, r1):
    """Dense E(x) = blockdiag(I_{r0}, G, I_{n-r1}) as one (k, n, nt) tensor
    (static slice sets, no scatters)."""
    k = G.shape[0]
    q = G.shape[-1]
    nt = n - (r1 - r0) + q
    dtype = G.dtype
    E = jnp.zeros((k, n, nt), dtype)
    E = E.at[:, :r0, :r0].set(jnp.eye(r0, dtype=dtype))
    E = E.at[:, r0:r1, r0:r0 + q].set(G)
    E = E.at[:, r1:, r0 + q:].set(jnp.eye(n - r1, dtype=dtype))
    return E


def _dense_rows_ms(E, M):
    """E^T M via multiply+reduce (E: (k, n, p), M: (k, n, j)) -> (k, p, j)."""
    return jnp.sum(E[..., :, :, None] * M[..., :, None, :], axis=-3)


def _dense_cols_ms(M, E):
    """M E via multiply+reduce (M: (k, i, n), E: (k, n, q)) -> (k, i, q)."""
    return jnp.sum(M[..., :, :, None] * E[..., None, :, :], axis=-2)


def _linearize_knots(model: DiscreteModel, xk, uk, tk, dtk,
                     opts: SolverOptions):
    """Batched discrete Jacobians at an explicit set of knots.

    ``xk (K, n) / uk (K, m) / tk (K,) / dtk (K,)`` are already sliced to the
    knots to linearize — the full first-(N-1) set for a cold solve, or a
    rotating refresh window for real-time MPC steps that carry Jacobians
    across solves (solvers/fixed.py)."""
    if opts.jacobian_mode in ("analytic1", "analytic2"):
        # Batched closed-form continuous Jacobians, scatter-free assembly
        # (Model.dynamics_jacobian_batch), discretized exactly like
        # approx1/approx.  Skips the jacfwd tangent traffic — the dominant
        # HBM cost of the RTI MPC step (VERDICT r2 #4).
        n = xk.shape[-1]
        dtype = xk.dtype
        Af, Bf = model.model.dynamics_jacobian_batch(xk, uk, tk)
        dt_ = dtk[:, None, None]
        eye = jnp.eye(n, dtype=dtype)
        if opts.jacobian_mode == "analytic1":
            return eye + dt_ * Af, dt_ * Bf
        AfAf = jnp.einsum("kij,kjl->kil", Af, Af)
        A = eye + dt_ * Af + (0.5 * dt_ * dt_) * AfAf
        B = dt_ * Bf + (0.5 * dt_ * dt_) * jnp.einsum("kij,kjl->kil", Af, Bf)
        return A, B
    if opts.jacobian_mode in ("approx", "approx1"):
        # jacfwd, NOT the analytic dynamics_jacobian override: the closed
        # forms assemble matrices entry-wise (scatters + tiny matmuls) and
        # measure 3x slower end-to-end on TPU than batched jacfwd passes
        # through the vectorized dynamics (bench 2026-08-18; same lesson as
        # the chain-rule revert).  Separate x/u passes also beat one fused
        # jacfwd over z=[x;u] by ~5% (the concat/slice relayout costs more
        # than the second primal trace saves), AND beat the single-trace
        # jax.jacfwd(f, argnums=(0, 1)) by 1.7% in the FULL MPC step
        # (38167 vs 37508 solves/s) even though the joint form is 56x
        # faster in isolation (0.24 vs 13.8 ms, tools/bench_linearize.py):
        # XLA overlaps/fuses the two-pass work inside the fused step, and
        # the joint form's layout costs the downstream more than it saves.
        f = model.model.dynamics
        n = xk.shape[-1]
        dtype = xk.dtype
        xl, ul = xk, uk
        if opts.linearize_dtype == "bfloat16":
            # Half-width tangents: the jacfwd stage is HBM-bandwidth bound
            # (tangent intermediates), and RTI MPC tolerates ~3-digit
            # Jacobians (the forward rollout stays exact f32).
            xl, ul = xl.astype(jnp.bfloat16), ul.astype(jnp.bfloat16)
        npas = int(getattr(model.model, "n_passive", 0) or 0)
        if npas:
            # The leading npas state columns of df/dx are exactly zero
            # (Model.n_passive): push tangents only through the active tail
            # and assemble the zero block with a static concat (no scatter).
            def f_tail(xt, xh, u_, t_):
                return f(jnp.concatenate([xh, xt]), u_, t_)
            Af_t = jax.vmap(jax.jacfwd(f_tail, argnums=0))(
                xl[:, npas:], xl[:, :npas], ul, tk)
            Af = jnp.concatenate(
                [jnp.zeros(Af_t.shape[:-1] + (npas,), Af_t.dtype), Af_t],
                axis=-1)
        else:
            Af = jax.vmap(jax.jacfwd(f, argnums=0))(xl, ul, tk)
        Bf = jax.vmap(jax.jacfwd(f, argnums=1))(xl, ul, tk)
        Af, Bf = Af.astype(dtype), Bf.astype(dtype)
        dt_ = dtk[:, None, None]
        eye = jnp.eye(n, dtype=dtype)
        if opts.jacobian_mode == "approx1":
            # First-order (Euler) linearization: skips the O(dt^2)
            # correction's batched tiny einsums (~30% of the whole RTI MPC
            # step at B=2048, for no measurable quality change).
            return eye + dt_ * Af, dt_ * Bf
        AfAf = jnp.einsum("kij,kjl->kil", Af, Af)
        A = eye + dt_ * Af + (0.5 * dt_ * dt_) * AfAf
        B = dt_ * Bf + (0.5 * dt_ * dt_) * jnp.einsum("kij,kjl->kil", Af, Bf)
        return A, B
    if opts.jacobian_mode == "chain":
        return jax.vmap(model.jacobian_chain)(xk, uk, tk, dtk)
    return jax.vmap(model.jacobian)(xk, uk, tk, dtk)


def _linearize(model: DiscreteModel, xs, us, times, dts, opts: SolverOptions):
    """Batched discrete Jacobians at the first N-1 knots."""
    return _linearize_knots(model, xs[:-1], us[:-1], times[:-1], dts[:-1],
                            opts)


def _backward_pass(model: DiscreteModel, expand_fn, xs, us, times, dts, rho, drho,
                   opts: SolverOptions, AB=None) -> _BackwardOut:
    """Regularized Riccati recursion (SURVEY.md §3.5 'backward Riccati pass
    w/ Quu regularization').

    The Quu factorization uses an unrolled small-matrix Cholesky
    (utils/linalg.py) — pure VPU arithmetic instead of XLA's generic
    cholesky/triangular-solve, which are slow for tiny blocks on TPU.

    For Lie-group models (errstate_dim < n, e.g. quaternion states) the
    expansion and dynamics Jacobians are mapped into the tangent space by
    the errstate Jacobian E(x) — the reference's ``error_expansion!``
    (abstract_constraint.jl:282-303) applied to the whole AL expansion:
    A~ = E(x')^T A E(x), lxx~ = E^T lxx E (Gauss-Newton, no curvature
    correction, matching the reference)."""
    n, m = xs.shape[-1], us.shape[-1]
    dtype = xs.dtype

    # Linearization and cost expansion do not depend on rho: computed ONCE,
    # outside the regularization retry loop.  ``AB`` lets callers reuse a
    # previous linearization (fixed-schedule MPC steps).
    A, B = _linearize(model, xs, us, times, dts, opts) if AB is None else AB
    exp = expand_fn(xs, us)

    if _use_errstate(model, opts):
        blk = getattr(model.model, "errstate_block", None)
        if blk is not None and opts.errstate_impl == "dense_ms":
            # Dense-E multiply/reduce path: ONE (k, n, nt) E tensor, rows
            # and cols applied as broadcast-mult + sum (fusable; no
            # dot_general operand materialization, no per-slice concats).
            r0, r1 = blk
            n = xs.shape[-1]
            G = jax.vmap(model.model.errstate_G)(xs)
            E = _dense_E(G, n, r0, r1)                          # (N, n, nt)
            A = _dense_rows_ms(E[1:], _dense_cols_ms(A, E[:-1]))
            B = _dense_rows_ms(E[1:], B)
            exp = exp.replace(
                x=jnp.sum(E * exp.x[..., :, None], axis=-2),
                xx=_dense_rows_ms(E, _dense_cols_ms(exp.xx, E)),
                ux=_dense_cols_ms(exp.ux, E),
            )
        elif blk is not None:
            # Structured path: E = blockdiag(I, G(x), I).  Same math as the
            # dense einsums below up to reassociation, at a fraction of the
            # HBM traffic (no (N, n, nt) E tensors, no 3-operand einsums).
            r0, r1 = blk
            if opts.errstate_impl == "mulsum":
                es_rows, es_cols, es_vec = _es_rows_ms, _es_cols_ms, _es_vec_ms
            else:
                es_rows, es_cols, es_vec = _es_rows, _es_cols, _es_vec
            G = jax.vmap(model.model.errstate_G)(xs)           # (N, p, q)
            A = es_rows(G[1:], es_cols(G[:-1], A, r0, r1), r0, r1)
            B = es_rows(G[1:], B, r0, r1)
            exp = exp.replace(
                x=es_vec(G, exp.x, r0, r1),
                xx=es_rows(G, es_cols(G, exp.xx, r0, r1), r0, r1),
                ux=es_cols(G, exp.ux, r0, r1),
            )
        else:
            E = jax.vmap(model.model.errstate_jacobian)(xs)        # (N, n, nt)
            A = jnp.einsum("kij,kil,kjp->klp", A, E[1:], E[:-1])   # E'^T A E
            B = jnp.einsum("kij,kil->klj", B, E[1:])               # E'^T B
            exp = exp.replace(
                x=jnp.einsum("ki,kip->kp", exp.x, E),
                xx=jnp.einsum("kij,kip,kjq->kpq", exp.xx, E, E),
                ux=jnp.einsum("kmi,kip->kmp", exp.ux, E),
            )

    def run_once(rho):
        Vx = exp.x[-1]
        Vxx = exp.xx[-1]
        eye_m = jnp.eye(m, dtype=dtype)

        if opts.riccati_body == "mulsum":
            # Broadcast-multiply+reduce algebra: under a large vmapped
            # batch XLA lays the Riccati inputs out batch-minor (scenarios
            # in lanes), where the per-knot dot_generals force per-step
            # relayouts — measured 99 ms/iteration for the @ body vs 15 ms
            # for this form at B=2048 (v5e, 2026-08-21; /tmp/cold_decomp).
            mtv = lambda X, v: jnp.sum(X * v[..., :, None], axis=-2)
            mv = lambda X, v: jnp.sum(X * v[..., None, :], axis=-1)
            mm = lambda X, Y: jnp.sum(
                X[..., :, :, None] * Y[..., None, :, :], axis=-2)
            mtm = lambda X, Y: jnp.sum(
                X[..., :, :, None] * Y[..., :, None, :], axis=-3)
            tr = lambda X: jnp.swapaxes(X, -1, -2)

            def bp_step(carry, inp):
                Vx, Vxx, dV1, dV2, fail = carry
                A_k, B_k, lxx, luu, lux, lx, lu = inp
                VA = mm(Vxx, A_k)
                Qx = lx + mtv(A_k, Vx)
                Qu = lu + mtv(B_k, Vx)
                Qxx = lxx + mtm(A_k, VA)
                Quu = luu + mtm(B_k, mm(Vxx, B_k))
                Qux = lux + mtm(B_k, VA)
                Quu_reg = Quu + rho * eye_m

                L, ok = chol_small(0.5 * (Quu_reg + tr(Quu_reg)))
                bad = ~ok
                K = -chol_solve_small(L, Qux)
                d = -chol_solve_small(L, Qu)

                Kt_Quu = mtm(K, Quu)
                Vx_n = Qx + mv(Kt_Quu, d) + mtv(K, Qu) + mtv(Qux, d)
                Vxx_n = Qxx + mm(Kt_Quu, K) + mtm(K, Qux) + mtm(Qux, K)
                Vxx_n = 0.5 * (Vxx_n + tr(Vxx_n))
                dV1_n = dV1 + jnp.sum(d * Qu, axis=-1)
                dV2_n = dV2 + 0.5 * jnp.sum(d * mv(Quu, d), axis=-1)
                fail_n = fail | bad | jnp.any(jnp.isnan(Vx_n)) \
                    | jnp.any(jnp.isnan(Vxx_n))
                return (Vx_n, Vxx_n, dV1_n, dV2_n, fail_n), (K, d)
        else:
            def bp_step(carry, inp):
                Vx, Vxx, dV1, dV2, fail = carry
                A_k, B_k, lxx, luu, lux, lx, lu = inp
                Qx = lx + A_k.T @ Vx
                Qu = lu + B_k.T @ Vx
                Qxx = lxx + A_k.T @ Vxx @ A_k
                Quu = luu + B_k.T @ Vxx @ B_k
                Qux = lux + B_k.T @ Vxx @ A_k
                Quu_reg = Quu + rho * eye_m

                L, ok = chol_small(0.5 * (Quu_reg + Quu_reg.T))
                bad = ~ok
                K = -chol_solve_small(L, Qux)
                d = -chol_solve_small(L, Qu)

                Vx_n = Qx + K.T @ Quu @ d + K.T @ Qu + Qux.T @ d
                Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
                dV1_n = dV1 + d @ Qu
                dV2_n = dV2 + 0.5 * d @ Quu @ d
                fail_n = fail | bad | jnp.any(jnp.isnan(Vx_n)) | jnp.any(jnp.isnan(Vxx_n))
                return (Vx_n, Vxx_n, dV1_n, dV2_n, fail_n), (K, d)

        zero = jnp.zeros((), dtype)
        inputs = (A, B, exp.xx[:-1], exp.uu[:-1], exp.ux[:-1], exp.x[:-1], exp.u[:-1])
        (Vx, Vxx, dV1, dV2, fail), (K, d) = jax.lax.scan(
            bp_step, (Vx, Vxx, zero, zero, jnp.array(False)), inputs,
            reverse=True, unroll=8,
        )
        return K, d, dV1, dV2, fail

    # SINGLE pass per iteration (no in-place retry loop: under vmap a retry
    # for one straggler scenario re-runs the whole scan for the entire
    # batch).  On failure the caller rejects the step and bumps rho for the
    # next iteration — the Tassa schedule spread across iterations.
    if opts.riccati == "parallel":
        from .parallel_riccati import parallel_riccati_gains
        K, d, dV1, dV2, fail = parallel_riccati_gains(
            A, B, exp.xx, exp.uu[:-1], exp.ux[:-1], exp.x, exp.u[:-1], rho)
    else:
        K, d, dV1, dV2, fail = run_once(rho)
    return _BackwardOut(K=K, d=d, dV1=dV1, dV2=dV2, rho=rho, drho=drho, fail=fail)


def _closed_loop_rollout(model: DiscreteModel, xs_ref, us_ref, K, d, alpha, x0,
                         times, dts, max_state: float):
    """x_{k+1} = f(x_k, u_ref_k + alpha d_k + K_k dx_k) with
    dx_k = state_diff(x_k, x_ref_k) — the Euclidean difference for vector
    states, the tangent-space error for Lie-group states (so K matches the
    error-state gains from the backward pass).  The gain's trailing dim is
    the static discriminator between the two conventions."""
    if K.shape[-1] != xs_ref.shape[-1]:
        diff = model.model.state_diff
    else:
        diff = lambda x, x0: x - x0

    def step(x, inp):
        x_ref, u_ref, K_k, d_k, t, dt = inp
        # gain application as multiply+reduce, not dot_general (see
        # riccati_body: batched tiny dots force per-step relayouts)
        dx = diff(x, x_ref)
        u = u_ref + alpha * d_k + jnp.sum(K_k * dx[..., None, :], axis=-1)
        xn = model.step(x, u, t, dt)
        xn = jnp.clip(xn, -max_state, max_state)
        return xn, (xn, u)

    inputs = (xs_ref[:-1], us_ref[:-1], K, d, times[:-1], dts[:-1])
    _, (xs_tail, us_new) = jax.lax.scan(step, x0, inputs, unroll=8)
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    us = jnp.concatenate([us_new, jnp.zeros_like(us_ref[-1:])], axis=0)
    return xs, us


def _forward_pass(model, cost_fn, xs, us, K, d, dV1, dV2, J0, x0, times, dts,
                  opts: SolverOptions):
    """PARALLEL line search on the expected-decrease ratio.

    TPU-first redesign of the reference solver's sequential backtracking
    (SURVEY.md §3.5 'forward rollout + line search'): all step sizes roll
    out in ONE batched scan (the alpha axis rides with the scenario batch,
    fattening the VPU lanes), then the largest accepted alpha is selected.
    Eliminates both the data-dependent retry loop and the vmap straggler
    effect of per-scenario backtracking.
    """
    dtype = xs.dtype
    nls = opts.iterations_linesearch
    if nls == 0:
        # Unconditional full Newton step (real-time-iteration mode): no
        # post-rollout cost evaluation, no acceptance test — warm-started
        # RTI steps essentially always accept alpha=1 anyway, and skipping
        # the acceptance lets XLA DCE BOTH AL cost evaluations from the
        # fixed-schedule step.  Guarded only against NaN (a NaN anywhere
        # in the rollout propagates to the final knot; the state clamp
        # keeps everything else finite).  Fixed-schedule solver only —
        # ilqr_solve's convergence tests need real cost changes.
        # Measured (v5e, B=2048 quadrotor RTI bench): only +0.8% over the
        # accept-tested single alpha, and rare scenarios blow up without
        # the descent guard (max viol 1e11 vs 3e-5 at 40 steps) — the
        # acceptance is nearly free under XLA fusion.  Prefer nls=1.
        xs_n, us_n = _closed_loop_rollout(
            model, xs, us, K, d, jnp.ones((), dtype), x0, times, dts,
            opts.max_state_value)
        finite = jnp.all(jnp.isfinite(xs_n[-1]))
        xs_n = jnp.where(finite, xs_n, xs)
        us_n = jnp.where(finite, us_n, us)
        return xs_n, us_n, J0, ~finite
    # Geometric schedule 1 -> min_alpha (the sequential halving schedule's
    # range, with the trial count decoupled from the smallest step).
    ratio = opts.line_search_min_alpha ** (1.0 / max(nls - 1, 1))
    alphas = ratio ** jnp.arange(nls, dtype=dtype)

    roll = jax.vmap(
        lambda a: _closed_loop_rollout(model, xs, us, K, d, a, x0, times, dts,
                                       opts.max_state_value))
    xs_all, us_all = roll(alphas)                       # (A, N, n), (A, N, m)
    J_all = jax.vmap(cost_fn)(xs_all, us_all)           # (A,)

    expected = -(alphas * dV1 + alphas * alphas * dV2)  # (A,)
    dJ = J0 - J_all
    z = dJ / jnp.maximum(expected, 1e-30)
    # A trial whose cost exceeds max_cost_value is out of the model's trust
    # region no matter what the descent test says (Altro's max_cost_value
    # safeguard).
    J_sane = jnp.isfinite(J_all) & (J_all < opts.max_cost_value)
    ok_expected = (expected > 0) & (z > opts.line_search_lower_bound) & (
        z < opts.line_search_upper_bound)
    ok_noexp = (expected <= 0) & (dJ > 0)
    ok = (ok_expected | ok_noexp) & J_sane
    any_ok = jnp.any(ok)
    best = jnp.argmax(ok)  # first (largest) accepted alpha

    # Monotone-descent fallback: when the ratio test rejects every alpha
    # but some step still lowers the cost, take the best of those — keeps
    # the solver grinding through the stiff-penalty regime where the
    # quadratic model mispredicts (the stall counter bounds how long).
    ok_desc = (dJ > 0) & J_sane
    any_desc = jnp.any(ok_desc)
    best_desc = jnp.argmax(jnp.where(ok_desc, dJ, -jnp.inf))

    accepted = any_ok | any_desc
    pick = jnp.where(any_ok, best, best_desc)
    xs_n = jnp.where(accepted, xs_all[pick], xs)
    us_n = jnp.where(accepted, us_all[pick], us)
    J_n = jnp.where(accepted, J_all[pick], J0)
    return xs_n, us_n, J_n, ~accepted


def ilqr_solve(
    model: DiscreteModel,
    cost_fn: Callable,
    expand_fn: Callable,
    x0: jax.Array,
    xs: jax.Array,
    us: jax.Array,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    max_iters: int = None,
    cost_tol: float = None,
    grad_tol: float = None,
    J0_init=None,
) -> ILQRResult:
    """Solve min cost_fn(xs, us) s.t. dynamics, from a dynamically-feasible
    (xs, us).  Fully jittable / vmappable.

    ``J0_init`` overrides the initial merit baseline.  A dynamically-
    INCONSISTENT state-guess iterate (al_solve warm-start seeding) carries
    an artificially low merit — no rollout trial can beat it, the line
    search always fails, and the stall test would 'converge' at the raw
    guess; the caller passes the ROLLOUT's merit instead so the first
    accepted step lands on a genuine trajectory (r5 defect-guard)."""
    if opts.iterations_linesearch == 0:
        raise ValueError(
            "iterations_linesearch=0 (unconditional full step) is only "
            "supported by the fixed-schedule solver (al_solve_fixed / "
            "MPC schedule=...): the to-tolerance loop's convergence tests "
            "need real cost changes")
    max_iters = opts.iterations_inner if max_iters is None else max_iters
    cost_tol = opts.cost_tolerance if cost_tol is None else cost_tol
    grad_tol = opts.gradient_tolerance if grad_tol is None else grad_tol
    dtype = xs.dtype
    J0 = cost_fn(xs, us) if J0_init is None else J0_init

    def cond(s: ILQRResult):
        return (~s.converged) & (~s.failed) & (s.iterations < max_iters)

    def body(s: ILQRResult):
        bp = _backward_pass(model, expand_fn, s.xs, s.us, times, dts, s.rho,
                            jnp.ones((), dtype), opts)
        xs_n, us_n, J_n, ls_failed = _forward_pass(
            model, cost_fn, s.xs, s.us, bp.K, bp.d, bp.dV1, bp.dV2, s.J, x0,
            times, dts, opts)
        # A failed factorization invalidates the step regardless of what the
        # line search found.
        ls_failed = ls_failed | bp.fail
        xs_n = jnp.where(bp.fail, s.xs, xs_n)
        us_n = jnp.where(bp.fail, s.us, us_n)
        J_n = jnp.where(bp.fail, s.J, J_n)
        # Altro's gradient metric: mean over knots of max_i |d_i|/(|u_i|+1),
        # measured against the controls the step actually produced.
        grad = jnp.mean(jnp.max(jnp.abs(bp.d) / (jnp.abs(us_n[:-1]) + 1), axis=-1))
        dJ = s.J - J_n
        expected = -(bp.dV1 + bp.dV2)  # predicted decrease at alpha = 1
        # Termination (Altro's evaluate_convergence): accepted step with BOTH
        # small cost change and small gradient; or the predicted decrease is
        # already below tolerance at a stalled line search (we are at the
        # optimum and backtracking cannot beat floating-point noise); or
        # dJ_counter_limit consecutive zero-progress iterations.
        conv_cost = (~ls_failed) & (dJ >= 0) & (dJ < cost_tol) & (grad < grad_tol)
        conv_stall = ls_failed & (~bp.fail) & (expected < cost_tol)
        no_progress = ls_failed | ((dJ >= 0) & (dJ < cost_tol))
        stall_count = jnp.where(no_progress, s.stall_count + 1, 0)
        converged = conv_cost | conv_stall | (stall_count >= opts.dJ_counter_limit)
        # On a line-search breakdown or failed factorization: bump
        # regularization and retry next iteration; declare failure only when
        # rho saturates.
        bump = ls_failed & (~converged)
        up = jnp.where(bp.fail, opts.bp_reg_increase_factor ** 4,
                       opts.bp_reg_increase_factor)
        rho_up = jnp.minimum(jnp.maximum(bp.rho * up, opts.bp_reg_min),
                             opts.bp_reg_max)
        # Tassa schedule: decay regularization again after accepted steps.
        rho_down = bp.rho / opts.bp_reg_increase_factor
        rho_down = jnp.where(rho_down < opts.bp_reg_min, 0.0, rho_down)
        rho_n = jnp.where(bump, rho_up, rho_down)
        failed = bump & (rho_n >= opts.bp_reg_max)
        return ILQRResult(
            xs=xs_n, us=us_n, J=J_n, iterations=s.iterations + 1,
            gradient=grad, dJ=dJ, rho=rho_n, stall_count=stall_count,
            converged=converged, failed=failed,
        )

    init = ILQRResult(
        xs=xs, us=us, J=J0,
        iterations=jnp.zeros((), jnp.int32),
        gradient=jnp.full((), jnp.inf, dtype),
        dJ=jnp.full((), jnp.inf, dtype),
        rho=jnp.asarray(opts.bp_reg_initial, dtype),
        stall_count=jnp.zeros((), jnp.int32),
        converged=jnp.array(False),
        failed=jnp.array(False),
    )
    return jax.lax.while_loop(cond, body, init)
