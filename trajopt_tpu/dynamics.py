"""Dynamics models, integrators, rollouts, and linearization.

TPU-native equivalent of the RobotDynamics.jl substrate the reference sits on
(SURVEY.md §2.2; /root/reference/docs/src/model.md:16-68).  A model is a frozen
pytree with a pure continuous vector field ``dynamics(x, u, t)``; the
framework discretizes it with an explicit integrator (RK4 default, matching
problem.jl:119-123) or the implicit-midpoint residual
(test/dynamics_constraints.jl:78-119).  Rollouts are ``lax.scan`` over the
knot axis; A/B Jacobians come from ``jax.jacfwd`` (the ForwardAD default of
the reference) vmapped over all knots at once.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "Model",
    "DiscreteModel",
    "RK4",
    "RK3",
    "Euler",
    "ImplicitMidpoint",
    "discretize",
    "rollout",
    "linearize",
    "implicit_midpoint_residual",
]


class Model:
    """Base class for continuous-time models: dx/dt = dynamics(x, u, t).

    Subclasses are ``flax.struct.dataclass`` pytrees whose fields are the
    physical parameters; ``n``/``m`` are static class attributes or
    properties (docs/src/model.md:16-68: ``dynamics``, ``state_dim``,
    ``control_dim``).  Deliberately NOT annotated here so they never become
    dataclass fields in subclasses.
    """

    def dynamics(self, x: jax.Array, u: jax.Array, t) -> jax.Array:
        raise NotImplementedError

    def dynamics_jacobian(self, x: jax.Array, u: jax.Array, t):
        """(df/dx, df/du) of the CONTINUOUS dynamics.

        Default: forward-mode AD (the reference's ForwardAD).  Models may
        override with closed forms (the reference's UserDefined rules) —
        the integrator chain rule then assembles the exact discrete
        Jacobian without AD through the integrator, which on TPU avoids
        the bandwidth-heavy jacfwd intermediate tensors.
        """
        Af = jax.jacfwd(self.dynamics, argnums=0)(x, u, t)
        Bf = jax.jacfwd(self.dynamics, argnums=1)(x, u, t)
        return Af, Bf

    # -- error-state (Lie-group) protocol; Euclidean defaults ----------------
    # Quaternion-state models override these (RobotDynamics state_diff /
    # errstate_dim / errstate_jacobian, SURVEY.md §2.2).
    @property
    def errstate_dim(self) -> int:
        return self.n

    def state_diff(self, x: jax.Array, x0: jax.Array) -> jax.Array:
        return x - x0

    def errstate_jacobian(self, x: jax.Array) -> jax.Array:
        """E(x): (n, errstate_dim) Jacobian of retraction at x."""
        return jnp.eye(self.n, dtype=x.dtype)


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------

def RK4(model: Model):
    """Classic 4th-order Runge-Kutta with zero-order-hold controls
    (the reference's default integrator, problem.jl:120)."""

    def step(x, u, t, dt):
        f = model.dynamics
        k1 = f(x, u, t)
        k2 = f(x + 0.5 * dt * k1, u, t + 0.5 * dt)
        k3 = f(x + 0.5 * dt * k2, u, t + 0.5 * dt)
        k4 = f(x + dt * k3, u, t + dt)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


def RK3(model: Model):
    """Kutta's 3rd-order method (Altro.jl's historical default)."""

    def step(x, u, t, dt):
        f = model.dynamics
        k1 = f(x, u, t)
        k2 = f(x + 0.5 * dt * k1, u, t + 0.5 * dt)
        k3 = f(x - dt * k1 + 2 * dt * k2, u, t + dt)
        return x + (dt / 6.0) * (k1 + 4 * k2 + k3)

    return step


def Euler(model: Model):
    """Explicit (forward) Euler (test/problems_tests.jl:88-89)."""

    def step(x, u, t, dt):
        return x + dt * model.dynamics(x, u, t)

    return step


def implicit_midpoint_residual(model: Model, x1, u1, x2, t, dt):
    """Implicit-midpoint defect r = x1 + dt*f((x1+x2)/2, u1) - x2
    (test/dynamics_constraints.jl:78-119)."""
    xm = 0.5 * (x1 + x2)
    return x1 + dt * model.dynamics(xm, u1, t + 0.5 * dt) - x2


def ImplicitMidpoint(model: Model, newton_iters: int = 10):
    """Implicit midpoint as an explicit step: solve the residual for x2 with a
    fixed-iteration Newton loop (static trip count keeps XLA happy)."""

    def step(x, u, t, dt):
        def residual(x2):
            return implicit_midpoint_residual(model, x, u, x2, t, dt)

        def body(_, x2):
            r = residual(x2)
            J = jax.jacfwd(residual)(x2)
            return x2 - jnp.linalg.solve(J, r)

        x2 = x + dt * model.dynamics(x, u, t)  # Euler predictor
        return jax.lax.fori_loop(0, newton_iters, body, x2)

    return step


_INTEGRATORS = {"rk4": RK4, "rk3": RK3, "euler": Euler, "implicit_midpoint": ImplicitMidpoint}


@struct.dataclass
class DiscreteModel:
    """A discretized model: ``step(x, u, t, dt) -> x_next``.

    Counterpart of RobotDynamics' ``DiscretizedDynamics`` (problem.jl:121).
    The integrator is a static tag (trace-time dispatch, like the reference's
    type-level ``QuadratureRule``); the continuous model's parameters stay
    pytree leaves so batched solves can vmap over them.
    """

    model: Model
    integrator: str = struct.field(pytree_node=False, default="rk4")

    @property
    def n(self) -> int:
        return self.model.n

    @property
    def m(self) -> int:
        return self.model.m

    def step(self, x, u, t, dt):
        return _INTEGRATORS[self.integrator](self.model)(x, u, t, dt)

    def discrete_dynamics(self, x, u, t, dt):
        return self.step(x, u, t, dt)

    def jacobian(self, x, u, t, dt) -> Tuple[jax.Array, jax.Array]:
        """Exact discrete Jacobians A = d step/dx, B = d step/du.

        Explicit integrators differentiate through the step with jacfwd
        (the reference's ForwardAD) — measured FASTER on TPU than a
        stage-chain assembly from ``dynamics_jacobian``, because the chain
        rule's batched tiny matmuls hit the MXU at ~1% utilization while
        jacfwd's tangent pushes stay element-wise on the VPU.  Euler uses
        the single analytic linearization (no chain); implicit midpoint
        uses the implicit-function theorem at the solved step.
        """
        model = self.model
        jac = model.dynamics_jacobian
        n = self.n

        if self.integrator == "euler":
            Af, Bf = jac(x, u, t)
            eye = jnp.eye(n, dtype=x.dtype)
            return eye + dt * Af, dt * Bf

        if self.integrator == "implicit_midpoint":
            # IFT on r(x1, u, x2) = x1 + dt f((x1+x2)/2, u) - x2 = 0:
            # A = (I - dt/2 Jx)^-1 (I + dt/2 Jx),  B = (I - dt/2 Jx)^-1 dt Ju
            eye = jnp.eye(n, dtype=x.dtype)
            x2 = self.step(x, u, t, dt)
            xm = 0.5 * (x + x2)
            Jx, Ju = jac(xm, u, t + 0.5 * dt)
            M = eye - 0.5 * dt * Jx
            A = jnp.linalg.solve(M, eye + 0.5 * dt * Jx)
            B = jnp.linalg.solve(M, dt * Ju)
            return A, B

        A = jax.jacfwd(self.step, argnums=0)(x, u, t, dt)
        B = jax.jacfwd(self.step, argnums=1)(x, u, t, dt)
        return A, B


def discretize(model: Model, integrator: str = "rk4") -> DiscreteModel:
    """Wrap a continuous model with an integrator (problem.jl:119-123)."""
    if isinstance(model, DiscreteModel):
        return model
    integrator = integrator.lower()
    if integrator not in _INTEGRATORS:
        raise ValueError(
            f"unknown integrator {integrator!r}; choose from {sorted(_INTEGRATORS)}"
        )
    return DiscreteModel(model=model, integrator=integrator)


def rollout(dmodel: DiscreteModel, x0: jax.Array, us: jax.Array, times: jax.Array,
            dts: jax.Array) -> jax.Array:
    """Open-loop forward simulation (problem.jl:330-340) as a ``lax.scan``.

    us/times/dts have N rows (terminal row unused, dt[N-1] = 0); returns the
    (N, n) state trajectory with xs[0] = x0.
    """

    def f(x, inp):
        u, t, dt = inp
        xn = dmodel.step(x, u, t, dt)
        return xn, xn

    _, xs_tail = jax.lax.scan(f, x0, (us[:-1], times[:-1], dts[:-1]), unroll=8)
    return jnp.concatenate([x0[None], xs_tail], axis=0)


def linearize(dmodel: DiscreteModel, xs: jax.Array, us: jax.Array, times: jax.Array,
              dts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched A, B Jacobians at the first N-1 knots: (N-1, n, n), (N-1, n, m).

    One vmapped jacfwd over the knot axis — the reference's per-knot
    ``dynamics_expansion!`` loop (test/internal_api.jl:69-80) collapsed into a
    single batched kernel.
    """
    jac = jax.vmap(dmodel.jacobian)
    return jac(xs[:-1], us[:-1], times[:-1], dts[:-1])
