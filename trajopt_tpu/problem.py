"""Problem: the full trajectory-optimization problem container.

TPU-native re-design of /root/reference/src/problem.jl.  The host-side
``Problem`` mirrors the reference's mutating API (``initial_controls!``,
``set_initial_state!`` etc., problem.jl:242-310) for construction and MPC
updates; solvers snapshot it into pure pytrees at the jit boundary, so every
mutation here is cheap host bookkeeping and nothing re-traces unless shapes
or the static structure change.

Mathematical problem (docs/src/index.md:24-33):
    min  lf(x_N) + sum_k l_k(x_k, u_k)
    s.t. x_{k+1} = f(x_k, u_k),  g_k(x_k, u_k) in K,  h_k(x_k, u_k) = 0
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .constraint_list import ConstraintList
from .constraints import GoalConstraint
from .costs import DiagonalCost, DiagonalQuatCost, QuadraticCost
from .dynamics import DiscreteModel, Model, discretize, rollout as _rollout
from .objective import Objective

__all__ = ["Problem"]


class Problem:
    """Trajectory optimization problem (problem.jl:36-111).

    Holds the discretized model, objective, constraint list, boundary states,
    the time grid, and the current state/control trajectory (the reference's
    ``SampledTrajectory``, stored here as dense (N, n)/(N, m) arrays — the
    terminal control row exists but is unused, mirroring the reference's
    terminal knot with dt = 0).
    """

    def __init__(
        self,
        model: Union[Model, DiscreteModel],
        obj: Objective,
        x0,
        tf: Optional[float] = None,
        xf=None,
        constraints: Optional[ConstraintList] = None,
        N: Optional[int] = None,
        X0=None,
        U0=None,
        dt=None,
        t0: float = 0.0,
        integration: str = "rk4",
    ):
        self.model = discretize(model, integration)
        self.obj = obj
        n, m = self.model.n, self.model.m
        N = obj.N if N is None else N
        if N != obj.N:
            raise ValueError(f"horizon N={N} != objective length {obj.N}")
        self.N = N

        x0 = jnp.asarray(x0)
        if x0.shape != (n,):
            raise ValueError(f"x0 shape {x0.shape} != ({n},)")
        self.x0 = x0
        self.xf = jnp.zeros(n, x0.dtype) if xf is None else jnp.asarray(xf)

        # Time grid: scalar dt, per-step dt vector, or tf (problem.jl:79-111;
        # uneven dt supported, test/problems_tests.jl:79-82).
        if dt is not None:
            dtv = np.asarray(dt, dtype=float)
            if dtv.ndim == 0:
                dtv = np.full(N - 1, float(dtv))
            if dtv.shape != (N - 1,):
                raise ValueError(f"dt must be scalar or length N-1={N - 1}")
        else:
            if tf is None:
                raise ValueError("provide either tf or dt")
            dtv = np.full(N - 1, tf / (N - 1))
        times = t0 + np.concatenate([[0.0], np.cumsum(dtv)])
        self.times = jnp.asarray(times, x0.dtype)
        # dts has N entries with the terminal dt = 0 (terminal knot semantics,
        # SURVEY.md §2.2 / test/cost_tests.jl:8-9).
        self.dts = jnp.asarray(np.concatenate([dtv, [0.0]]), x0.dtype)

        if constraints is None:
            constraints = ConstraintList(n, m, N)
        if (constraints.n, constraints.m, constraints.N) != (n, m, N):
            raise ValueError(
                f"constraint dims {(constraints.n, constraints.m, constraints.N)} "
                f"!= problem dims {(n, m, N)}"
            )
        self.constraints = constraints

        # Default states are NaN-filled (problems_tests.jl:92-99); controls zero.
        if X0 is None:
            X0 = jnp.full((N, n), jnp.nan, x0.dtype)
        else:
            X0 = jnp.asarray(X0)
            if X0.ndim == 1:
                X0 = jnp.tile(X0[None], (N, 1))
        if U0 is None:
            U0 = jnp.zeros((N, m), x0.dtype)
        else:
            U0 = jnp.asarray(U0)
            if U0.ndim == 1:
                U0 = jnp.tile(U0[None], (N, 1))
            if U0.shape[0] == N - 1:  # allow N-1 controls like the reference
                U0 = jnp.concatenate([U0, jnp.zeros((1, m), U0.dtype)])
        if X0.shape != (N, n):
            raise ValueError(f"X0 shape {X0.shape} != {(N, n)}")
        if U0.shape != (N, m):
            raise ValueError(f"U0 shape {U0.shape} != {(N, m)}")
        self.xs = X0
        self.us = U0

    # -- getters (problem.jl:134-231) -----------------------------------------
    @property
    def n(self) -> int:
        return self.model.n

    @property
    def m(self) -> int:
        return self.model.m

    @property
    def tf(self) -> float:
        return float(self.times[-1])

    def horizonlength(self) -> int:
        return self.N

    def states(self, k: Optional[int] = None):
        return self.xs if k is None else self.xs[k]

    def controls(self, k: Optional[int] = None):
        return self.us[:-1] if k is None else self.us[k]

    def gettimes(self):
        return self.times

    def get_model(self) -> DiscreteModel:
        return self.model

    def get_objective(self) -> Objective:
        return self.obj

    def get_constraints(self) -> ConstraintList:
        return self.constraints

    def get_trajectory(self):
        return self.xs, self.us

    def num_constraints(self) -> np.ndarray:
        return self.constraints.num_constraints()

    # -- initialization (problem.jl:242-261) ----------------------------------
    def initial_states(self, X0) -> "Problem":
        X0 = jnp.asarray(X0)
        if X0.shape != self.xs.shape:
            raise ValueError(f"X0 shape {X0.shape} != {self.xs.shape}")
        self.xs = X0
        return self

    def initial_controls(self, U0) -> "Problem":
        U0 = jnp.asarray(U0)
        if U0.ndim == 1:
            U0 = jnp.tile(U0[None], (self.N, 1))
        if U0.shape[0] == self.N - 1:
            U0 = jnp.concatenate([U0, jnp.zeros((1, self.m), U0.dtype)])
        if U0.shape != self.us.shape:
            raise ValueError(f"U0 shape {U0.shape} != {self.us.shape}")
        self.us = U0
        return self

    def initial_trajectory(self, X0, U0) -> "Problem":
        return self.initial_states(X0).initial_controls(U0)

    # -- MPC mutators (problem.jl:270-310) ------------------------------------
    def set_initial_state(self, x0) -> "Problem":
        x0 = jnp.asarray(x0)
        if x0.shape != self.x0.shape:
            raise ValueError("x0 dimension mismatch")
        self.x0 = x0
        return self

    def set_initial_time(self, t0: float) -> "Problem":
        """Shift the time grid to start at t0 (problem.jl:280-284)."""
        shift = t0 - float(self.times[0])
        self.times = self.times + shift
        return self

    def set_goal_state(self, xf, objective: bool = True, constraint: bool = True) -> "Problem":
        """Retarget xf, the objective's linear terms, and any GoalConstraint
        (problem.jl:294-310)."""
        xf = jnp.asarray(xf)
        self.xf = xf
        if objective:
            costs = self.obj.costs
            if isinstance(costs, (DiagonalCost, DiagonalQuatCost)):
                q = -costs.Qd * xf[None, :]
                c = 0.5 * jnp.sum(costs.Qd * xf[None, :] ** 2, axis=-1)
                self.obj = self.obj.replace(costs=costs.replace(q=q, c=c))
            elif isinstance(costs, QuadraticCost):
                q = -jnp.einsum("kij,j->ki", costs.Q, xf)
                c = 0.5 * jnp.einsum("i,kij,j->k", xf, costs.Q, xf)
                self.obj = self.obj.replace(costs=costs.replace(q=q, c=c))
            else:
                raise TypeError("set_goal_state: unsupported objective cost type")
        if constraint:
            for i, con in enumerate(self.constraints.constraints):
                if isinstance(con, GoalConstraint):
                    self.constraints.constraints[i] = con.set_goal_state(xf)
        return self

    # -- evaluation (problem.jl:321-340) --------------------------------------
    def cost(self) -> jax.Array:
        return self.obj.cost(self.xs, self.us)

    def rollout(self) -> "Problem":
        """Simulate forward from x0 with the current controls, storing the
        states (problem.jl:330-340)."""
        self.xs = _rollout(self.model, self.x0, self.us, self.times, self.dts)
        return self
