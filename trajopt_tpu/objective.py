"""Objectives: per-knot cost stacks, LQR / tracking builders, MPC retargeting.

TPU-native re-design of /root/reference/src/objective.jl.  The reference
stores ``Vector{C}`` of per-knot cost objects of one concrete type
(objective.jl:27-45); here the N costs are ONE pytree whose leaves carry a
leading knot axis, so total cost and expansion are single ``vmap`` calls over
the knot axis (and batch cleanly over scenarios).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from .costs import CostExpansion, DiagonalCost, LQRCost, QuadraticCost

__all__ = [
    "Objective",
    "LQRObjective",
    "TrackingObjective",
    "update_trajectory",
]


def _tree_stack(costs: Sequence[Any]):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *costs)


def _tree_index(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


@struct.dataclass
class Objective:
    """N per-knot costs stacked along a leading axis (objective.jl:27-45).

    All knots share one concrete cost type, as in the reference ("all costs
    one concrete type"); per-knot variation lives in the coefficient arrays.
    """

    costs: Any  # stacked cost pytree; leaves (N, ...)
    N: int = struct.field(pytree_node=False)

    @classmethod
    def from_costs(cls, costs: Sequence[Any]) -> "Objective":
        return cls(costs=_tree_stack(costs), N=len(costs))

    @classmethod
    def from_cost(cls, cost: Any, N: int) -> "Objective":
        """Same cost at every knot (``Objective(cost, N)`` objective.jl:124-135)."""
        stacked = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (N,) + jnp.shape(a)), cost
        )
        return cls(costs=stacked, N=N)

    def cost_at(self, k: int):
        return _tree_index(self.costs, k)

    # -- evaluation (objective.jl:89-106) -------------------------------------
    def get_J(self, xs: jax.Array, us: jax.Array) -> jax.Array:
        """Per-knot cost vector J (objective.jl:104-106).

        ``us`` has N rows; the terminal row is ignored (terminal knots drop
        control terms, cost_functions.jl:92).
        """
        stage_J = jax.vmap(lambda c, x, u: c.stage_cost(x, u))(self.costs, xs, us)
        term_J = self.cost_at(self.N - 1).term_cost(xs[-1])
        return stage_J.at[-1].set(term_J)

    def cost(self, xs: jax.Array, us: jax.Array) -> jax.Array:
        """Total cost: sum of per-knot costs (objective.jl:89-93)."""
        return jnp.sum(self.get_J(xs, us))

    # -- expansion -------------------------------------------------------------
    def expansion(self, xs: jax.Array, us: jax.Array) -> CostExpansion:
        """Stacked second-order expansion over all N knots.

        Control blocks of the terminal knot are zeroed (the reference skips
        R/r/H terms at terminal knots, cost_functions.jl:141,160,221).
        """
        exp = jax.vmap(lambda c, x, u: c.expansion(x, u))(self.costs, xs, us)
        term = self.cost_at(self.N - 1).term_expansion(xs[-1])
        return jax.tree_util.tree_map(lambda a, t: a.at[-1].set(t), exp, term)


def LQRObjective(Q, R, Qf, xf, N: int, uf=None, dtype=None) -> Objective:
    """LQR tracking objective (objective.jl:137-183).

    Stage cost 1/2 (x-xf)'Q(x-xf) + 1/2 (u-uf)'R(u-uf) for k < N-1 and
    terminal cost 1/2 (x-xf)'Qf(x-xf).
    """
    stage = LQRCost(Q, R, xf, uf=uf, dtype=dtype)
    term = LQRCost(Qf, jnp.zeros_like(jnp.asarray(R, dtype=dtype)), xf, dtype=dtype)
    if type(stage) is not type(term):
        raise TypeError("Q and Qf must both be diagonal or both dense")
    return Objective.from_costs([stage] * (N - 1) + [term])


def TrackingObjective(Q, R, X_ref, U_ref, Qf=None, dtype=None) -> Objective:
    """Per-knot LQR costs tracking a reference trajectory (objective.jl:190-205)."""
    N = len(X_ref)
    Qf = Q if Qf is None else Qf
    costs = [LQRCost(Q, R, X_ref[k], uf=U_ref[k], dtype=dtype) for k in range(N - 1)]
    costs.append(LQRCost(Qf, jnp.zeros_like(jnp.asarray(R, dtype=dtype)), X_ref[-1], dtype=dtype))
    return Objective.from_costs(costs)


def update_trajectory(obj: Objective, X_ref, U_ref) -> Objective:
    """Receding-horizon retarget (objective.jl:207-212, set_LQR_goal!
    cost_functions.jl:249-258): rewrite the linear terms q, r (and constant c)
    so each knot tracks the new reference, keeping Q/R weights.

    Works for stacked :class:`DiagonalCost` objectives (the tracking-MPC fast
    path); X_ref: (N, n), U_ref: (N, m) (terminal row of U_ref ignored).
    """
    costs = obj.costs
    if not isinstance(costs, DiagonalCost):
        raise TypeError("update_trajectory supports DiagonalCost objectives")
    X_ref = jnp.asarray(X_ref, costs.q.dtype)
    U_ref = jnp.asarray(U_ref, costs.r.dtype)
    q = -costs.Qd * X_ref
    r = -costs.Rd * U_ref
    c = 0.5 * jnp.sum(costs.Qd * X_ref * X_ref, axis=-1) + 0.5 * jnp.sum(
        costs.Rd * U_ref * U_ref, axis=-1
    )
    return obj.replace(costs=costs.replace(q=q, r=r, c=c))
