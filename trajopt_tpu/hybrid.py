"""Hybrid per-knot model vectors with dimension-changing jump maps.

TPU-native rebuild of the reference's hybrid-dynamics support: a ``Problem``
may carry a *vector* of models, one per step, where a "jump map" model whose
``output_dim`` differs from its state dim changes the state/control dimension
mid-trajectory (src/dynamics.jl:15-31; test/hybrid_dynamics_model.jl).

Rectangular tensors are non-negotiable on TPU, so dimension changes are
realized by **max-dim padding + static per-knot structure** (the path called
out in SURVEY.md §7 hard part 6):

* :func:`trajopt_tpu.dynamics.dims` validates the output/state chain and
  yields per-knot ``nx, nu``.
* :class:`HybridModel` packs the model vector into one ``DiscreteModel``-like
  pytree over the padded ``(nmax, mmax)`` space.  The active model at a knot
  is recovered from the (static) time grid and dispatched with
  ``lax.switch`` — a traced index, so the whole rollout stays one ``lax.scan``
  and batches/vmaps cleanly.  Padded state dims integrate as zeros (zero
  vector field), padded control dims have zero dynamics influence.
* Jump maps (``output_dim != n``) are applied as *discrete* maps
  ``x+ = f(x, u, t)`` (no integration through a dimension-changing vector
  field; the reference never integrates its JumpMap either —
  hybrid_dynamics_model.jl only steps the regular models).
* :func:`pad_costs` / :func:`pad_constraints` embed per-knot-dim costs and
  constraints into the padded space.  Unused control dims get a small ridge
  so the Riccati ``Quu`` stays positive definite; since those controls have
  zero dynamics influence and start at zero, the optimum is unchanged.
* :func:`HybridProblem` assembles a regular :class:`Problem` over the padded
  space — every existing solver (iLQR / AL / ALTRO, batched or not) then
  works unchanged.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .constraint_list import ConstraintList
from .constraints import change_dimension
from .costs import DiagonalCost, QuadraticCost
from .dynamics import DiscreteModel, Model, dims, discretize
from .objective import Objective
from .problem import Problem

__all__ = ["HybridModel", "HybridProblem", "pad_costs", "pad_constraints", "dims"]


def _base(mod):
    return mod.model if isinstance(mod, DiscreteModel) else mod


def _model_key(dm: DiscreteModel):
    """Dedup key: model type + integrator + parameter leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(dm)
    parts = [type(_base(dm)).__name__, dm.integrator, str(treedef)]
    for leaf in leaves:
        parts.append(np.asarray(leaf).tobytes())
    return tuple(parts)


@struct.dataclass
class HybridModel:
    """A per-knot model vector as one padded discrete model
    (hybrid_dynamics_model.jl:44-58 behavior on TPU-shaped tensors).

    ``models`` holds the distinct discretized models; ``model_ids[k]`` is the
    (static) index of the model governing step k.  The step's knot index is
    recovered from the time argument against the static time grid, so the
    object satisfies the standard ``step(x, u, t, dt)`` protocol and slots
    into every solver unchanged.
    """

    models: Tuple[Any, ...]  # distinct DiscreteModels (pytree children)
    knot_times: jax.Array  # (N,) time grid
    model_ids: Tuple[int, ...] = struct.field(pytree_node=False)
    nx: Tuple[int, ...] = struct.field(pytree_node=False)  # per-knot state dims
    nu: Tuple[int, ...] = struct.field(pytree_node=False)  # per-knot control dims
    half_min_dt: float = struct.field(pytree_node=False)

    is_discrete = True  # discretize() passes this through untouched

    @classmethod
    def create(cls, models: Sequence, times, integration: str = "rk4") -> "HybridModel":
        models = [discretize(m, integration) for m in models]
        nx, nu = dims(models)
        times = jnp.asarray(times)
        if times.shape[0] != len(models) + 1:
            raise ValueError(
                f"time grid length {times.shape[0]} != num models + 1 = {len(models) + 1}"
            )
        distinct: List = []
        keys = {}
        ids = []
        for dm in models:
            key = _model_key(dm)
            if key not in keys:
                keys[key] = len(distinct)
                distinct.append(dm)
            ids.append(keys[key])
        dt_min = float(np.min(np.diff(np.asarray(times))))
        return cls(
            models=tuple(distinct),
            knot_times=times,
            model_ids=tuple(ids),
            nx=tuple(int(v) for v in nx),
            nu=tuple(int(v) for v in nu),
            half_min_dt=0.5 * dt_min,
        )

    # -- DiscreteModel protocol over the padded space -------------------------
    @property
    def n(self) -> int:
        return max(self.nx)

    @property
    def m(self) -> int:
        return max(self.nu)

    @property
    def N(self) -> int:
        return len(self.nx)

    @property
    def model(self) -> "_ContinuousFacade":
        return _ContinuousFacade(self)

    def knot_of(self, t) -> jax.Array:
        """Step index k with times[k] == t (robust to fp noise < dt/2)."""
        k = jnp.searchsorted(self.knot_times, t + self.half_min_dt) - 1
        return jnp.clip(k, 0, len(self.model_ids) - 1)

    def _branches(self, jump_as_discrete: bool = True):
        nmax = self.n

        def make(dm):
            base = _base(dm)
            is_jump = base.output_dim != base.n

            def br(x, u, t, dt):
                xi, ui = x[: base.n], u[: base.m]
                if is_jump and jump_as_discrete:
                    y = base.dynamics(xi, ui, t)  # instantaneous jump map
                else:
                    y = dm.step(xi, ui, t, dt)
                return jnp.zeros(nmax, x.dtype).at[: y.shape[0]].set(y)

            return br

        return [make(dm) for dm in self.models]

    def step(self, x, u, t, dt):
        mid = jnp.asarray(self.model_ids)[self.knot_of(t)]
        return jax.lax.switch(mid, self._branches(), x, u, t, dt)

    def discrete_dynamics(self, x, u, t, dt):
        return self.step(x, u, t, dt)

    def jacobian(self, x, u, t, dt):
        A = jax.jacfwd(self.step, argnums=0)(x, u, t, dt)
        B = jax.jacfwd(self.step, argnums=1)(x, u, t, dt)
        return A, B

    jacobian_chain = jacobian  # switched step: jacfwd is the chain rule here

    def continuous_dynamics(self, x, u, t):
        """Padded switched vector field (jump knots: zero field — jumps are
        discrete, applied by ``step``)."""
        nmax = self.n

        def make(dm):
            base = _base(dm)
            is_jump = base.output_dim != base.n

            def br(x, u, t):
                if is_jump:
                    return jnp.zeros(nmax, x.dtype)
                y = base.dynamics(x[: base.n], u[: base.m], t)
                return jnp.zeros(nmax, x.dtype).at[: y.shape[0]].set(y)

            return br

        mid = jnp.asarray(self.model_ids)[self.knot_of(t)]
        return jax.lax.switch(mid, [make(dm) for dm in self.models], x, u, t)


class _ContinuousFacade:
    """Euclidean ``model.model`` facade (errstate protocol defaults) so the
    solvers' Lie-group hooks see a plain vector state."""

    def __init__(self, hm: HybridModel):
        self._hm = hm
        self.n = hm.n
        self.m = hm.m

    @property
    def errstate_dim(self) -> int:
        return self.n

    def dynamics(self, x, u, t):
        return self._hm.continuous_dynamics(x, u, t)

    def state_diff(self, x, x0):
        return x - x0

    def errstate_jacobian(self, x):
        return jnp.eye(self.n, dtype=x.dtype)


# ---------------------------------------------------------------------------
# Padding of costs / constraints into the (nmax, mmax) space
# ---------------------------------------------------------------------------

def _cost_dims(cost) -> Tuple[int, int]:
    if isinstance(cost, DiagonalCost):
        return int(cost.q.shape[-1]), int(cost.r.shape[-1])
    if isinstance(cost, QuadraticCost):
        return int(cost.q.shape[-1]), int(cost.r.shape[-1])
    raise TypeError(f"cannot infer dims of cost type {type(cost).__name__}")


def pad_cost(cost, nmax: int, mmax: int, control_ridge: float = 1e-2):
    """Embed a cost over (n, m) into (nmax, mmax).

    Padded state dims get zero weight; padded control dims get a
    ``control_ridge`` diagonal so Quu stays positive definite (those controls
    have zero dynamics influence, so the optimum is unchanged and they stay
    at their zero initialization).
    """
    n, m = _cost_dims(cost)
    if (n, m) == (nmax, mmax):
        return cost
    if isinstance(cost, DiagonalCost):
        Qd = jnp.zeros(nmax, cost.Qd.dtype).at[:n].set(cost.Qd)
        Rd = jnp.full((mmax,), control_ridge, cost.Rd.dtype).at[:m].set(cost.Rd)
        q = jnp.zeros(nmax, cost.q.dtype).at[:n].set(cost.q)
        r = jnp.zeros(mmax, cost.r.dtype).at[:m].set(cost.r)
        return cost.replace(Qd=Qd, Rd=Rd, q=q, r=r)
    Q = jnp.zeros((nmax, nmax), cost.Q.dtype).at[:n, :n].set(cost.Q)
    R = control_ridge * jnp.eye(mmax, dtype=cost.R.dtype)
    R = R.at[:m, :m].set(cost.R)
    H = jnp.zeros((mmax, nmax), cost.H.dtype).at[:m, :n].set(cost.H)
    q = jnp.zeros(nmax, cost.q.dtype).at[:n].set(cost.q)
    r = jnp.zeros(mmax, cost.r.dtype).at[:m].set(cost.r)
    return cost.replace(Q=Q, R=R, H=H, q=q, r=r)


def pad_costs(costs: Sequence, nmax: int, mmax: int,
              control_ridge: float = 1e-2) -> Objective:
    """Pad a per-knot cost list to uniform dims and stack into an Objective."""
    return Objective.from_costs(
        [pad_cost(c, nmax, mmax, control_ridge) for c in costs]
    )


def pad_constraints(cons: ConstraintList, nmax: int, mmax: int) -> ConstraintList:
    """Embed every constraint into the padded space via the reference's
    generic ``change_dimension`` fallback (IndexedConstraint scatter,
    constraints.jl:934-936)."""
    out = ConstraintList(nmax, mmax, cons.N)
    for (con, inds), diff in zip(cons.blocks(), cons.diffs):
        n = getattr(con, "n", nmax)
        m = getattr(con, "m", mmax)
        if (n, m) != (nmax, mmax):
            con = change_dimension(con, nmax, mmax)
        out.add_constraint(con, inds, diff_method=diff)
    return out


def HybridProblem(
    models: Sequence,
    costs,
    x0,
    tf: Optional[float] = None,
    constraints: Optional[ConstraintList] = None,
    dt=None,
    t0: float = 0.0,
    integration: str = "rk4",
    control_ridge: float = 1e-2,
    **kwargs,
) -> Problem:
    """Build a padded :class:`Problem` from a per-step model vector
    (``Problem(models, obj, x0, tf)``; hybrid_dynamics_model.jl:77-118).

    ``costs`` is a length-N list of per-knot costs in the *per-knot* dims
    (or an already-uniform :class:`Objective`).  Validates cost/constraint
    dims against ``dims(models)`` exactly like the reference's inner
    constructor (DimensionMismatch on any knot whose dims disagree).
    """
    nx, nu = dims([discretize(m, integration) for m in models])
    N = len(nx)
    nmax, mmax = max(nx), max(nu)

    # -- objective validation + padding (hybrid_dynamics_model.jl:103-104) ----
    if isinstance(costs, Objective):
        if costs.N != N:
            raise ValueError(f"DimensionMismatch: objective length {costs.N} != N={N}")
        c0 = costs.cost_at(0)
        cn, cm = _cost_dims(c0)
        if any(v != cn for v in nx) or any(v != cm for v in nu):
            raise ValueError(
                "DimensionMismatch: uniform objective dims "
                f"({cn},{cm}) do not match per-knot model dims"
            )
        obj = costs
    else:
        costs = list(costs)
        if len(costs) != N:
            raise ValueError(f"DimensionMismatch: {len(costs)} costs != N={N}")
        for k, c in enumerate(costs):
            cn, cm = _cost_dims(c)
            if cn != nx[k] or (k < N - 1 and cm != nu[k]):
                raise ValueError(
                    f"DimensionMismatch: cost {k} dims ({cn},{cm}) != "
                    f"model dims ({nx[k]},{nu[k]})"
                )
        obj = pad_costs(costs, nmax, mmax, control_ridge)

    # -- constraint validation + padding (hybrid_dynamics_model.jl:106-115) ---
    if constraints is not None:
        if constraints.N != N:
            raise ValueError("DimensionMismatch: constraint list horizon != N")
        cons_nx = getattr(constraints, "nx", [constraints.n] * N)
        cons_nu = getattr(constraints, "nu", [constraints.m] * N)
        if list(cons_nx) != list(nx) or list(cons_nu) != list(nu):
            if not (list(cons_nx) == [nmax] * N and list(cons_nu) == [mmax] * N):
                raise ValueError(
                    "DimensionMismatch: constraint-list per-knot dims do not "
                    "match the model vector's"
                )
        constraints = pad_constraints(constraints, nmax, mmax)

    # -- time grid + model ------------------------------------------------------
    if dt is not None:
        dtv = np.asarray(dt, dtype=float)
        if dtv.ndim == 0:
            dtv = np.full(N - 1, float(dtv))
    else:
        if tf is None:
            raise ValueError("provide either tf or dt")
        dtv = np.full(N - 1, tf / (N - 1))
    times = t0 + np.concatenate([[0.0], np.cumsum(dtv)])

    hmodel = HybridModel.create(models, times, integration)

    x0 = jnp.asarray(x0)
    if x0.shape[-1] == nx[0]:
        x0 = jnp.zeros(nmax, x0.dtype).at[: nx[0]].set(x0)
    elif x0.shape[-1] != nmax:
        raise ValueError(f"DimensionMismatch: x0 dim {x0.shape[-1]} != {nx[0]}")

    prob = Problem(hmodel, obj, x0, tf=tf, dt=dt, t0=t0,
                   constraints=constraints, **kwargs)
    prob.nx, prob.nu = list(nx), list(nu)  # per-knot dims metadata
    return prob
