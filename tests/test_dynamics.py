"""Dynamics/integrator tests — the RobotDynamics-substrate behavior the
reference depends on (SURVEY.md §2.2; test/dynamics_constraints.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.dynamics import (
    discretize, implicit_midpoint_residual, linearize, rollout,
)
from trajopt_tpu.models import Cartpole, DoubleIntegrator, Pendulum, Quadrotor


def test_rk4_exact_on_linear_system():
    # double integrator with constant u: exact x(t) = x0 + v0 t + 1/2 a t^2
    model = DoubleIntegrator(mass=2.0, d=1)
    dm = discretize(model, "rk4")
    x0 = jnp.array([1.0, -0.5])
    u = jnp.array([3.0])
    dt = 0.1
    x1 = dm.step(x0, u, 0.0, dt)
    a = 3.0 / 2.0
    assert np.allclose(x1, [1.0 - 0.5 * dt + 0.5 * a * dt**2, -0.5 + a * dt], atol=1e-12)


def test_integrator_order():
    # RK4 error ~ dt^5 per step, Euler ~ dt^2: halving dt shrinks the
    # one-step error by ~32x / ~4x respectively on the pendulum.
    model = Pendulum()
    x0 = jnp.array([0.3, -0.2])
    u = jnp.array([0.5])

    def one_step_err(integrator, dt):
        dm = discretize(model, integrator)
        fine = discretize(model, "rk4")
        ref = x0
        for i in range(64):  # tiny-step reference
            ref = fine.step(ref, u, i * dt / 64, dt / 64)
        return float(jnp.linalg.norm(dm.step(x0, u, 0.0, dt) - ref))

    e1, e2 = one_step_err("rk4", 0.2), one_step_err("rk4", 0.1)
    assert e1 / e2 > 20  # ~32 ideally
    e1, e2 = one_step_err("euler", 0.2), one_step_err("euler", 0.1)
    assert 3 < e1 / e2 < 6


def test_implicit_midpoint():
    # residual is zero at the computed step (dynamics_constraints.jl:78-119)
    model = Pendulum()
    dm = discretize(model, "implicit_midpoint")
    x0 = jnp.array([0.3, -0.2]); u = jnp.array([0.5]); dt = 0.05
    x1 = dm.step(x0, u, 0.0, dt)
    r = implicit_midpoint_residual(model, x0, u, x1, 0.0, dt)
    assert np.allclose(r, 0.0, atol=1e-10)
    # 2nd-order accurate: near RK4 at small dt
    x1_rk4 = discretize(model, "rk4").step(x0, u, 0.0, dt)
    assert np.allclose(x1, x1_rk4, atol=1e-3)


def test_rollout_matches_manual(rng):
    # quickstart.jl:90-96
    model = Cartpole()
    dm = discretize(model, "rk4")
    N = 11
    us = jnp.asarray(rng.standard_normal((N, 1)))
    times = jnp.linspace(0, 1.0, N)
    dts = jnp.full(N, 0.1).at[-1].set(0.0)
    xs = rollout(dm, jnp.zeros(4), us, times, dts)
    x = jnp.zeros(4)
    for k in range(N - 1):
        x = dm.step(x, us[k], times[k], dts[k])
    assert np.allclose(xs[-1], x, atol=1e-12)
    assert xs.shape == (N, 4)


def test_linearize_matches_jacfwd(rng):
    model = Quadrotor()
    dm = discretize(model, "rk4")
    N = 4
    xs = jnp.asarray(rng.standard_normal((N, 13)))
    xs = xs.at[:, 3:7].set(xs[:, 3:7] / jnp.linalg.norm(xs[:, 3:7], axis=-1, keepdims=True))
    us = jnp.asarray(rng.random((N, 4)))
    times = jnp.linspace(0, 0.3, N)
    dts = jnp.full(N, 0.1).at[-1].set(0.0)
    A, B = linearize(dm, xs, us, times, dts)
    assert A.shape == (N - 1, 13, 13) and B.shape == (N - 1, 13, 4)
    k = 1
    A_k = jax.jacfwd(lambda x: dm.step(x, us[k], times[k], dts[k]))(xs[k])
    assert np.allclose(A[k], A_k, atol=1e-12)


def test_quadrotor_error_state(rng):
    model = Quadrotor()
    assert model.errstate_dim == 12
    x = jnp.asarray(rng.standard_normal(13))
    x = x.at[3:7].set(x[3:7] / jnp.linalg.norm(x[3:7]))
    E = model.errstate_jacobian(x)
    assert E.shape == (13, 12)
    # E's quaternion block is orthonormal: G(q)'G(q) = I
    G = E[3:7, 3:6]
    assert np.allclose(G.T @ G, np.eye(3), atol=1e-12)
    # state_diff of x with itself is zero
    assert np.allclose(model.state_diff(x, x), 0.0, atol=1e-12)


def test_jacobian_chain_matches_jacfwd(rng):
    """The integrator chain rule (jacobian_mode='chain') is machine-precision
    identical to AD through the step, for rk4 and rk3."""
    model = Quadrotor()
    for integ in ("rk4", "rk3"):
        dm = discretize(model, integ)
        x = jnp.asarray(rng.standard_normal(13))
        x = x.at[3:7].set(x[3:7] / jnp.linalg.norm(x[3:7]))
        u = jnp.asarray(rng.random(4))
        A, B = dm.jacobian(x, u, 0.1, 0.05)
        Ac, Bc = dm.jacobian_chain(x, u, 0.1, 0.05)
        assert np.allclose(A, Ac, atol=1e-11), integ
        assert np.allclose(B, Bc, atol=1e-11), integ
