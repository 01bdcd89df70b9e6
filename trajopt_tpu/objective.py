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
    # Per-knot derivative method (objective.jl:32-34 stores a DiffMethod per
    # cost): None = every knot uses the cost type's hand-written expansion
    # (the UserDefined/analytic rules); otherwise a length-N tuple of
    # "analytic" | "ad" (forward-over-reverse AD of stage_cost, the
    # reference's ForwardAD) | "fd" (central finite differences, the
    # reference's FiniteDifference).  Static: resolved at trace time.
    diff_methods: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def from_costs(cls, costs: Sequence[Any]) -> "Objective":
        return cls(costs=_tree_stack(costs), N=len(costs))

    def with_diff_methods(self, methods) -> "Objective":
        """Set per-knot DiffMethods; a single string applies to all knots."""
        if isinstance(methods, str):
            methods = (methods,) * self.N
        methods = tuple(methods)
        if len(methods) != self.N:
            raise ValueError(f"need {self.N} diff methods, got {len(methods)}")
        bad = set(methods) - {"analytic", "ad", "fd"}
        if bad:
            raise ValueError(f"unknown diff methods {sorted(bad)}")
        return self.replace(
            diff_methods=None if set(methods) == {"analytic"} else methods)

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
        With ``diff_methods`` set, each knot's expansion comes from its
        selected derivative engine; one vmapped pass runs per DISTINCT
        method and a static mask selects rows, so the uniform case costs
        exactly one pass.
        """
        if self.diff_methods is None:
            exp = jax.vmap(lambda c, x, u: c.expansion(x, u))(
                self.costs, xs, us)
            term = self.cost_at(self.N - 1).term_expansion(xs[-1])
        else:
            fns = {"analytic": lambda c, x, u: c.expansion(x, u),
                   "ad": _expand_ad, "fd": _expand_fd}
            tfns = {"analytic": lambda c, x: c.term_expansion(x),
                    "ad": _term_expand_ad, "fd": _term_expand_fd}
            exp = None
            for meth in dict.fromkeys(self.diff_methods):  # ordered unique
                e = jax.vmap(fns[meth])(self.costs, xs, us)
                if exp is None:
                    exp = e
                else:
                    mask = jnp.asarray(
                        [m_ == meth for m_ in self.diff_methods])
                    exp = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(
                            mask.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                        exp, e)
            term = tfns[self.diff_methods[-1]](self.cost_at(self.N - 1),
                                               xs[-1])
        return jax.tree_util.tree_map(lambda a, t: a.at[-1].set(t), exp, term)


def _expand_ad(cost, x, u) -> CostExpansion:
    """ForwardAD engine: forward-over-reverse AD of ``stage_cost``
    (src/TrajectoryOptimization.jl:22-23 ForwardAD)."""
    f = lambda x_, u_: cost.stage_cost(x_, u_)
    gx = jax.grad(f, argnums=0)(x, u)
    gu = jax.grad(f, argnums=1)(x, u)
    xx = jax.jacfwd(jax.grad(f, argnums=0), argnums=0)(x, u)
    uu = jax.jacfwd(jax.grad(f, argnums=1), argnums=1)(x, u)
    ux = jax.jacfwd(jax.grad(f, argnums=1), argnums=0)(x, u)
    return CostExpansion(xx=xx, uu=uu, ux=ux, x=gx, u=gu, c=f(x, u))


def _term_expand_ad(cost, x) -> CostExpansion:
    f = lambda x_: cost.term_cost(x_)
    gx = jax.grad(f)(x)
    xx = jax.jacfwd(jax.grad(f))(x)
    m = cost.m
    n = x.shape[-1]
    z = jnp.zeros
    return CostExpansion(xx=xx, uu=z((m, m), x.dtype), ux=z((m, n), x.dtype),
                         x=gx, u=z((m,), x.dtype), c=f(x))


def _fd_grad(f, z, eps):
    """Central-difference gradient of scalar ``f`` at ``z``."""
    def one(i):
        dz = jnp.zeros_like(z).at[i].set(eps)
        return (f(z + dz) - f(z - dz)) / (2 * eps)
    return jax.vmap(one)(jnp.arange(z.shape[-1]))


def _expand_fd(cost, x, u) -> CostExpansion:
    """FiniteDifference engine: central differences of ``stage_cost``
    (the reference's FiniteDiff path)."""
    n, m = x.shape[-1], u.shape[-1]
    z0 = jnp.concatenate([x, u])
    f = lambda z: cost.stage_cost(z[:n], z[n:])
    eps = jnp.asarray(jnp.finfo(x.dtype).eps ** (1.0 / 3.0), x.dtype)
    g = _fd_grad(f, z0, eps)
    # wider step for the second differencing: truncation/roundoff balance
    # for a double central difference is eps^(1/4)
    e2 = jnp.asarray(jnp.finfo(x.dtype).eps ** 0.25, x.dtype)
    H = jax.vmap(
        lambda i: (_fd_grad(f, z0 + jnp.zeros_like(z0).at[i].set(e2), e2)
                   - _fd_grad(f, z0 - jnp.zeros_like(z0).at[i].set(e2), e2))
        / (2 * e2))(jnp.arange(n + m))
    H = 0.5 * (H + H.T)
    return CostExpansion(xx=H[:n, :n], uu=H[n:, n:], ux=H[n:, :n],
                         x=g[:n], u=g[n:], c=f(z0))


def _term_expand_fd(cost, x) -> CostExpansion:
    n = x.shape[-1]
    m = cost.m
    f = lambda z: cost.term_cost(z)
    eps = jnp.asarray(jnp.finfo(x.dtype).eps ** (1.0 / 3.0), x.dtype)
    g = _fd_grad(f, x, eps)
    e2 = jnp.asarray(jnp.finfo(x.dtype).eps ** 0.25, x.dtype)
    H = jax.vmap(
        lambda i: (_fd_grad(f, x + jnp.zeros_like(x).at[i].set(e2), e2)
                   - _fd_grad(f, x - jnp.zeros_like(x).at[i].set(e2), e2))
        / (2 * e2))(jnp.arange(n))
    H = 0.5 * (H + H.T)
    z = jnp.zeros
    return CostExpansion(xx=H, uu=z((m, m), x.dtype), ux=z((m, n), x.dtype),
                         x=g, u=z((m,), x.dtype), c=f(x))


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
