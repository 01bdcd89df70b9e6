"""Projected-Newton solution polish (ALTRO phase 2).

The reference's solver stack finishes with a projected-Newton phase that
polishes the AL solution to tight feasibility (docs/old/solvers.md: "ALTRO";
SURVEY.md §3.5).  This is the TPU-native version: the trajectory is one flat
vector z = [x_1..x_{N-1}, u_0..u_{N-2}] (x_0 pinned), the active-constraint
and dynamics-defect Jacobian D is built DENSE from the already-vmapped block
Jacobians — a (P, Z) matrix whose normal equations D D^T are one big MXU
Cholesky — and each Newton step is the minimum-norm correction

    dz = -D^T (D D^T + eps I)^(-1) r

iterated a fixed small number of times (nonlinear constraints re-linearized
each pass).  Equality and inequality (active-set) rows participate; SOC
feasibility is already enforced to AL tolerance and its rows are skipped.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..cones import Cone
from ..constraints import full_width_jacobian
from ..dynamics import DiscreteModel
from ..objective import Objective
from .al import ALSolution, ConstraintBlock, eval_blocks, max_violation_blocks
from .options import SolverOptions

__all__ = ["projected_newton"]


def _flatten(xs, us):
    # z = [x_1..x_{N-1}; u_0..u_{N-2}] — x_0 is fixed, terminal u unused.
    return jnp.concatenate([xs[1:].reshape(-1), us[:-1].reshape(-1)])


def _unflatten(z, xs, us):
    N, n = xs.shape
    m = us.shape[-1]
    nx = (N - 1) * n
    xs_n = jnp.concatenate([xs[:1], z[:nx].reshape(N - 1, n)], axis=0)
    us_n = jnp.concatenate([z[nx:].reshape(N - 1, m), us[-1:]], axis=0)
    return xs_n, us_n


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
) -> ALSolution:
    """Polish ``sol`` to tight feasibility with dense minimum-norm Newton
    projections onto {dynamics defects = 0, active constraints = 0}."""
    N, n = sol.xs.shape
    m = sol.us.shape[-1]
    Z = (N - 1) * (n + m)

    def x_index(k):  # position of x_k in z (k >= 1)
        return (k - 1) * n

    def u_index(k):
        return (N - 1) * n + k * m

    def residual_and_jac(xs, us):
        rows = []
        # dynamics defects: f(x_k, u_k) - x_{k+1} = 0, k = 0..N-2
        A, B = jax.vmap(model.jacobian)(xs[:-1], us[:-1], times[:-1], dts[:-1])
        defects = jax.vmap(model.step)(xs[:-1], us[:-1], times[:-1], dts[:-1]) - xs[1:]
        D_dyn = jnp.zeros((N - 1, n, Z), xs.dtype)
        for k in range(N - 1):
            if k >= 1:
                D_dyn = D_dyn.at[k, :, x_index(k):x_index(k) + n].set(A[k])
            D_dyn = D_dyn.at[k, :, u_index(k):u_index(k) + m].set(B[k])
            D_dyn = D_dyn.at[k, :, x_index(k + 1):x_index(k + 1) + n].set(
                -jnp.eye(n, dtype=xs.dtype))
        rows.append((defects.reshape(-1), D_dyn.reshape(-1, Z),
                     jnp.ones((N - 1) * n, dtype=bool)))

        for block in blocks:
            sense = block.con.sense
            if sense is Cone.SECOND_ORDER:
                continue  # handled by the AL phase
            idx = jnp.array(block.inds)
            c = jax.vmap(block.con.evaluate)(xs[idx], us[idx])      # (K, p)
            Jc = jax.vmap(lambda x, u: full_width_jacobian(block.con, x, u))(
                xs[idx], us[idx])                                   # (K, p, n+m)
            K_, p = c.shape
            D_blk = jnp.zeros((K_, p, Z), xs.dtype)
            for i, k in enumerate(block.inds):
                if k >= 1:
                    D_blk = D_blk.at[i, :, x_index(k):x_index(k) + n].set(Jc[i, :, :n])
                if k < N - 1:
                    D_blk = D_blk.at[i, :, u_index(k):u_index(k) + m].set(Jc[i, :, n:])
            if sense is Cone.ZERO:
                act = jnp.ones_like(c, dtype=bool)
            else:
                # NegativeOrthant: only VIOLATED rows enter; a feasible
                # near-boundary row must not be pulled onto the boundary.
                act = c > 0
            rows.append((c.reshape(-1), D_blk.reshape(-1, Z), act.reshape(-1)))

        r = jnp.concatenate([x[0] for x in rows])
        D = jnp.concatenate([x[1] for x in rows], axis=0)
        act = jnp.concatenate([x[2] for x in rows])
        # inactive rows are masked out (zero row + zero residual)
        r = jnp.where(act, r, 0.0)
        D = D * act[:, None].astype(D.dtype)
        return r, D

    def newton_step(carry, _):
        xs, us = carry
        r, D = residual_and_jac(xs, us)
        P = r.shape[0]
        G = D @ D.T + reg * jnp.eye(P, dtype=D.dtype)
        L = jnp.linalg.cholesky(G)
        y = jax.scipy.linalg.cho_solve((L, True), r)
        dz = -D.T @ y
        z = _flatten(xs, us) + dz
        xs_n, us_n = _unflatten(z, xs, us)
        return (xs_n, us_n), jnp.max(jnp.abs(r))

    (xs, us), _ = jax.lax.scan(newton_step, (sol.xs, sol.us), None,
                               length=newton_iters)
    cvals = eval_blocks(blocks, xs, us)
    viol = max_violation_blocks(blocks, cvals)
    # include dynamics defect in the reported violation
    defect = jnp.max(jnp.abs(
        jax.vmap(model.step)(xs[:-1], us[:-1], times[:-1], dts[:-1]) - xs[1:]))
    viol = jnp.maximum(viol, defect)
    return sol.replace(
        xs=xs, us=us, J=obj.cost(xs, us), max_violation=viol,
        converged=sol.converged & (viol < opts.constraint_tolerance),
    )
