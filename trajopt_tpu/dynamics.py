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
    "dims",
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

    #: Number of LEADING state entries the continuous dynamics does not
    #: depend on (cyclic/passive coordinates: positions of a quadrotor or
    #: rocket, the x,y of a Dubins car, the cart position).  df/dx has
    #: exactly-zero columns there, so batched linearization can skip those
    #: jacfwd tangents — the hottest stage of the RTI MPC step.
    n_passive = 0

    def dynamics(self, x: jax.Array, u: jax.Array, t) -> jax.Array:
        raise NotImplementedError

    @property
    def output_dim(self) -> int:
        """Output dimension of ``dynamics``; differs from ``n`` only for
        dimension-changing jump maps in hybrid model vectors
        (RobotDynamics ``output_dim``; test/hybrid_dynamics_model.jl:22)."""
        return self.n

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

    def dynamics_jacobian_batch(self, xs, us, ts):
        """Batched (Af, Bf) over a leading K axis.

        Default: vmap of :meth:`dynamics_jacobian`.  Models with closed
        forms should override with a SCATTER-FREE assembly (stack/concat of
        dense blocks — never ``.at[].set``, which XLA lowers to scatters;
        see models/quadrotor.py) so the hottest linearization stage skips
        the jacfwd tangent traffic entirely
        (``SolverOptions(jacobian_mode="analytic1"/"analytic2")``).
        """
        return jax.vmap(self.dynamics_jacobian)(xs, us, ts)

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

    #: Structured error-state marker: ``None`` (dense E(x) einsums) or a
    #: static ``(r0, r1)`` row range meaning E(x) is block-diagonal
    #: ``[I_{r0}, G(x), I_{n-r1}]`` with the only non-identity block given
    #: by :meth:`errstate_G`.  Solvers then transform expansions with
    #: static slice concats + tiny G matmuls instead of materializing
    #: (B, N, n, nt) E tensors.  Measured on v5e (B=2048 RTI MPC bench,
    #: 2026-08-21): 16,693 solves/s at full quality vs 6,696 (with broken
    #: tails) for the dense einsums it replaced — 2.5x — and 38,310 for
    #: error_state=False; quaternion-cost workloads that need the tangent
    #: space pay 2.3x, not 5.7x (PARITY.md perf table).
    errstate_block = None

    def errstate_G(self, x: jax.Array) -> jax.Array:
        """The non-identity block of E(x) when ``errstate_block = (r0, r1)``
        is set: shape ``(p, q)`` with ``p = r1 - r0`` and
        ``q = p - (n - errstate_dim)`` (e.g. the (4, 3) quaternion attitude
        Jacobian of the quadrotor's 13->12 error state)."""
        raise NotImplementedError


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

    def jacobian_chain(self, x, u, t, dt) -> Tuple[jax.Array, jax.Array]:
        """Exact discrete Jacobians assembled via the integrator chain rule
        from the continuous ``dynamics_jacobian`` (the reference's
        UserDefined/analytic path).

        Mathematically identical to :meth:`jacobian`; numerically it differs
        at machine precision, and it is the better choice when the model
        overrides ``dynamics_jacobian`` with closed forms on CPU/f64 (on TPU
        the stage-chain's tiny matmuls underutilize the MXU — measured 23x
        slower than jacfwd's elementwise tangent pushes, hence not the
        default; select with ``SolverOptions(jacobian_mode="chain")``).
        """
        model = self.model
        f = model.dynamics
        jac = model.dynamics_jacobian
        n = self.n

        if self.integrator == "rk4":
            eye = jnp.eye(n, dtype=x.dtype)
            k1 = f(x, u, t)
            a2 = x + 0.5 * dt * k1
            k2 = f(a2, u, t + 0.5 * dt)
            a3 = x + 0.5 * dt * k2
            J1x, J1u = jac(x, u, t)
            J2x, J2u = jac(a2, u, t + 0.5 * dt)
            J3x, J3u = jac(a3, u, t + 0.5 * dt)
            a4 = x + dt * f(a3, u, t + 0.5 * dt)
            J4x, J4u = jac(a4, u, t + dt)
            K1x, K1u = J1x, J1u
            K2x = J2x @ (eye + 0.5 * dt * K1x)
            K2u = J2x @ (0.5 * dt * K1u) + J2u
            K3x = J3x @ (eye + 0.5 * dt * K2x)
            K3u = J3x @ (0.5 * dt * K2u) + J3u
            K4x = J4x @ (eye + dt * K3x)
            K4u = J4x @ (dt * K3u) + J4u
            A = eye + (dt / 6.0) * (K1x + 2 * K2x + 2 * K3x + K4x)
            B = (dt / 6.0) * (K1u + 2 * K2u + 2 * K3u + K4u)
            return A, B

        if self.integrator == "rk3":
            eye = jnp.eye(n, dtype=x.dtype)
            k1 = f(x, u, t)
            a2 = x + 0.5 * dt * k1
            k2 = f(a2, u, t + 0.5 * dt)
            a3 = x - dt * k1 + 2 * dt * k2
            J1x, J1u = jac(x, u, t)
            J2x, J2u = jac(a2, u, t + 0.5 * dt)
            J3x, J3u = jac(a3, u, t + dt)
            K1x, K1u = J1x, J1u
            K2x = J2x @ (eye + 0.5 * dt * K1x)
            K2u = J2x @ (0.5 * dt * K1u) + J2u
            K3x = J3x @ (eye - dt * K1x + 2 * dt * K2x)
            K3u = J3x @ (-dt * K1u + 2 * dt * K2u) + J3u
            A = eye + (dt / 6.0) * (K1x + 4 * K2x + K3x)
            B = (dt / 6.0) * (K1u + 4 * K2u + K3u)
            return A, B

        return self.jacobian(x, u, t, dt)


def dims(models) -> Tuple[list, list]:
    """Per-knot state/control dims of a hybrid model vector
    (RD.dims(models::Vector); src/dynamics.jl:15-31, hybrid_dynamics_model.jl:52-54).

    ``models`` has N-1 entries (one per step); returns length-N ``nx, nu``.
    Validates the output/state chain: ``output_dim(models[k])`` must equal
    ``state_dim(models[k+1])`` (jump maps change dimension); raises
    ``ValueError`` otherwise (the reference's DimensionMismatch,
    hybrid_dynamics_model.jl:60-65).
    """
    models = list(models)
    if not models:
        raise ValueError("empty model vector")

    def _nm(mod):
        base = mod.model if isinstance(mod, DiscreteModel) else mod
        return base.n, base.m, base.output_dim

    nx, nu = [], []
    for k, mod in enumerate(models):
        n, m, p = _nm(mod)
        nx.append(n)
        nu.append(m)
        if k + 1 < len(models):
            n_next = _nm(models[k + 1])[0]
            if p != n_next:
                raise ValueError(
                    f"DimensionMismatch: model {k} output dim {p} != "
                    f"model {k + 1} state dim {n_next} (missing jump map?)"
                )
    nx.append(_nm(models[-1])[2])
    nu.append(nu[-1])
    return nx, nu


def discretize(model: Model, integrator: str = "rk4") -> DiscreteModel:
    """Wrap a continuous model with an integrator (problem.jl:119-123)."""
    if isinstance(model, DiscreteModel) or getattr(model, "is_discrete", False):
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
