"""Infeasible-start ALTRO: slack-augmented dynamics.

The ALTRO trick for starting from a state-trajectory guess that is not
dynamically consistent (docs/old/solver_interface.md "infeasible-start
model augmentation"; SURVEY.md §3.5): augment the controls with slack
defects s_k,

    x_{k+1} = f(x_k, u_k) + s_k,

initialize s_k = xbar_{k+1} - f(xbar_k, ubar_k) so the rollout reproduces
the guess EXACTLY, penalize s quadratically, and constrain s = 0 through
the augmented Lagrangian.  Once the AL drives the slacks to zero the
solution is dynamically feasible; a final slack-free solve warm-starts
from it.

Everything composes from existing pieces: a slack model wrapper, a
control-extended objective, ``IndexedConstraint`` re-indexing of the
original constraints, and a Linear equality constraint on the slack slice.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..cones import Cone
from ..constraints import IndexedConstraint, LinearConstraint
from ..costs import DiagonalCost, QuadraticCost
from ..dynamics import DiscreteModel
from ..objective import Objective
from .al import ALSolution, ConstraintBlock, al_solve
from .options import SolverOptions

__all__ = ["SlackModel", "solve_infeasible"]


@struct.dataclass
class SlackModel:
    """DiscreteModel wrapper with additive slack controls:
    step(x, [u; s]) = base.step(x, u) + s."""

    base: DiscreteModel

    @property
    def n(self) -> int:
        return self.base.n

    @property
    def m(self) -> int:
        return self.base.m + self.base.n

    @property
    def model(self):
        return self.base.model  # error-state / state_diff pass-through

    def step(self, x, u, t, dt):
        m0 = self.base.m
        return self.base.step(x, u[:m0], t, dt) + u[m0:]

    def jacobian(self, x, u, t, dt):
        m0 = self.base.m
        A, B = self.base.jacobian(x, u[:m0], t, dt)
        eye = jnp.eye(self.base.n, dtype=x.dtype)
        return A, jnp.concatenate([B, eye], axis=1)

    def jacobian_chain(self, x, u, t, dt):
        m0 = self.base.m
        A, B = self.base.jacobian_chain(x, u[:m0], t, dt)
        eye = jnp.eye(self.base.n, dtype=x.dtype)
        return A, jnp.concatenate([B, eye], axis=1)


def _augment_objective(obj: Objective, n: int, slack_weight: float) -> Objective:
    """Extend the control dimension of a stacked objective with slack
    penalty 1/2 * slack_weight * ||s||^2."""
    costs = obj.costs
    N = obj.N
    if isinstance(costs, DiagonalCost):
        Rd = jnp.concatenate(
            [costs.Rd, jnp.full((N, n), slack_weight, costs.Rd.dtype)], axis=-1)
        r = jnp.concatenate(
            [costs.r, jnp.zeros((N, n), costs.r.dtype)], axis=-1)
        return obj.replace(costs=costs.replace(Rd=Rd, r=r))
    if isinstance(costs, QuadraticCost):
        m0 = costs.R.shape[-1]
        R = jnp.zeros((N, m0 + n, m0 + n), costs.R.dtype)
        R = R.at[:, :m0, :m0].set(costs.R)
        R = R.at[:, m0:, m0:].set(
            slack_weight * jnp.eye(n, dtype=costs.R.dtype)[None])
        H = jnp.concatenate(
            [costs.H, jnp.zeros((N, n, costs.H.shape[-1]), costs.H.dtype)],
            axis=-2)
        r = jnp.concatenate(
            [costs.r, jnp.zeros((N, n), costs.r.dtype)], axis=-1)
        return obj.replace(costs=costs.replace(R=R, H=H, r=r))
    raise TypeError("infeasible start supports Diagonal/Quadratic objectives")


def solve_infeasible(
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    x0: jax.Array,
    xs_guess: jax.Array,
    us_init: jax.Array,
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
) -> ALSolution:
    """Infeasible-start ALTRO solve from a state-trajectory guess.

    Phase 1 solves the slack-augmented problem (guess reproduced exactly);
    phase 2 re-solves slack-free, warm-started from the phase-1 controls.
    """
    n, m = model.n, model.m
    N = xs_guess.shape[0]
    aug = SlackModel(base=model)

    # slacks reproducing the guess: s_k = xbar_{k+1} - f(xbar_k, ubar_k)
    pred = jax.vmap(model.step)(xs_guess[:-1], us_init[:-1], times[:-1], dts[:-1])
    slacks = xs_guess[1:] - pred
    us_aug = jnp.concatenate([
        us_init,
        jnp.concatenate([slacks, jnp.zeros((1, n), us_init.dtype)], axis=0),
    ], axis=-1)

    obj_aug = _augment_objective(obj, n, opts.slack_penalty)
    blocks_aug = tuple(
        ConstraintBlock(
            con=IndexedConstraint.create(n, m + n, b.con,
                                         ix=range(n), iu=range(m)),
            inds=b.inds)
        for b in blocks
    )
    slack_eq = LinearConstraint.create(
        n, m + n, np.eye(n), np.zeros(n), sense=Cone.ZERO,
        inds=range(n + m, n + m + n))
    blocks_aug = blocks_aug + (
        ConstraintBlock(con=slack_eq, inds=tuple(range(N - 1))),)

    sol_aug = al_solve(aug, obj_aug, blocks_aug, x0, us_aug, times, dts, opts,
                       xs_init=xs_guess)

    # Phase 2: slack-free solve warm-started from the augmented solution.
    us_w = sol_aug.us[:, :m]
    duals_w = sol_aug.duals[:-1]  # drop the slack-equality block's duals
    sol = al_solve(model, obj, tuple(blocks), x0, us_w, times, dts, opts,
                   xs_init=sol_aug.xs, duals_init=duals_w)
    return sol.replace(iterations=sol.iterations + sol_aug.iterations,
                       outer_iterations=sol.outer_iterations
                       + sol_aug.outer_iterations)
