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


def test_errstate_structured_transforms_match_dense(rng):
    """The structured blockdiag(I, G, I) transforms (_es_rows/_es_cols/
    _es_vec, Model.errstate_block) reproduce the dense E(x) einsums to
    machine precision, and _backward_pass yields identical gains whether
    the model advertises the structured block or falls back to dense E."""
    from trajopt_tpu import LQRObjective, discretize
    from trajopt_tpu.solvers import SolverOptions
    from trajopt_tpu.solvers.ilqr import (_backward_pass, _es_cols, _es_rows,
                                          _es_vec)

    model = Quadrotor()
    N = 6
    xs = jnp.asarray(rng.standard_normal((N, 13)))
    xs = xs.at[:, 3:7].set(
        xs[:, 3:7] / jnp.linalg.norm(xs[:, 3:7], axis=-1, keepdims=True))
    E = jax.vmap(model.errstate_jacobian)(xs)          # (N, 13, 12)
    G = jax.vmap(model.errstate_G)(xs)                 # (N, 4, 3)
    r0, r1 = model.errstate_block

    A = jnp.asarray(rng.standard_normal((N, 13, 13)))
    Bm = jnp.asarray(rng.standard_normal((N, 13, 4)))
    lxx = jnp.asarray(rng.standard_normal((N, 13, 13)))
    lux = jnp.asarray(rng.standard_normal((N, 4, 13)))
    lx = jnp.asarray(rng.standard_normal((N, 13)))

    dense_A = jnp.einsum("kij,kil,kjp->klp", A, E, E)
    struct_A = _es_rows(G, _es_cols(G, A, r0, r1), r0, r1)
    assert np.allclose(dense_A, struct_A, atol=1e-12)
    assert np.allclose(jnp.einsum("kij,kil->klj", Bm, E),
                       _es_rows(G, Bm, r0, r1), atol=1e-12)
    assert np.allclose(jnp.einsum("kij,kip,kjq->kpq", lxx, E, E),
                       _es_rows(G, _es_cols(G, lxx, r0, r1), r0, r1),
                       atol=1e-12)
    assert np.allclose(jnp.einsum("kmi,kip->kmp", lux, E),
                       _es_cols(G, lux, r0, r1), atol=1e-12)
    assert np.allclose(jnp.einsum("ki,kip->kp", lx, E),
                       _es_vec(G, lx, r0, r1), atol=1e-12)

    # end-to-end: identical backward-pass gains via a real expansion
    class DenseQuad(Quadrotor):
        errstate_block = None

    us = 0.1 * jnp.asarray(rng.random((N, 4)))
    times = jnp.linspace(0, 0.5, N)
    dts = jnp.full(N, 0.1).at[-1].set(0.0)
    xf = Quadrotor.build_state([0.0, 1.0, 1.0])
    obj = LQRObjective(jnp.ones(13), jnp.ones(4), 10.0 * jnp.ones(13), xf, N)
    opts = SolverOptions(error_state=True)
    rho = jnp.zeros(())
    outs = []
    for m in (Quadrotor(), DenseQuad()):
        dm = discretize(m, "rk4")
        outs.append(_backward_pass(dm, obj.expansion, xs, us, times, dts,
                                   rho, rho, opts))
    assert outs[0].K.shape[-1] == 12
    assert np.allclose(outs[0].K, outs[1].K, atol=1e-10)
    assert np.allclose(outs[0].d, outs[1].d, atol=1e-10)


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


def test_linearize_approx_modes(rng):
    """approx (O(dt^2)) and approx1 (Euler) linearizations approach the
    exact discrete Jacobian at the expected orders; bfloat16 tangents stay
    within bf16 precision of the f32 result."""
    import trajopt_tpu as to
    from trajopt_tpu.models import Quadrotor
    from trajopt_tpu.solvers import SolverOptions
    from trajopt_tpu.solvers.ilqr import _linearize

    model = Quadrotor()
    dm = to.discretize(model, "rk4")
    N, n, m = 5, 13, 4
    xs = jnp.asarray(rng.standard_normal((N, n)) * 0.2)
    xs = xs.at[:, 3:7].set(xs[:, 3:7] / jnp.linalg.norm(xs[:, 3:7], axis=1,
                                                        keepdims=True))
    us = jnp.asarray(2.0 + 0.1 * rng.standard_normal((N, m)))
    times = jnp.linspace(0.0, 0.4, N)

    def err(mode, dt, **kw):
        dts = jnp.full(N, dt).at[-1].set(0.0)
        A1, B1 = _linearize(dm, xs, us, times, dts,
                            SolverOptions(jacobian_mode=mode, **kw))
        A0, B0 = _linearize(dm, xs, us, times, dts,
                            SolverOptions(jacobian_mode="exact"))
        return float(jnp.max(jnp.abs(A1 - A0))), float(jnp.max(jnp.abs(B1 - B0)))

    # order check: both approximations converge at ~O(dt^2) to the exact
    # RK4 Jacobian (the state-dependence of Af along the RK4 stages caps
    # the order); halving dt shrinks the error ~4x, and the O(dt^2)
    # variant has the smaller constant.
    a_h, a_l = err("approx", 0.05)[0], err("approx", 0.025)[0]
    assert a_h / a_l > 3.0, (a_h, a_l)
    e_h, e_l = err("approx1", 0.05)[0], err("approx1", 0.025)[0]
    assert e_h / e_l > 3.0, (e_h, e_l)
    assert e_h > a_h  # first-order is coarser than O(dt^2)

    # bf16 tangents: same A,B within bf16 resolution, output dtype preserved
    dts = jnp.full(N, 0.05).at[-1].set(0.0)
    A32, B32 = _linearize(dm, xs, us, times, dts,
                          SolverOptions(jacobian_mode="approx1"))
    A16, B16 = _linearize(dm, xs, us, times, dts,
                          SolverOptions(jacobian_mode="approx1",
                                        linearize_dtype="bfloat16"))
    assert A16.dtype == xs.dtype
    assert float(jnp.max(jnp.abs(A16 - A32))) < 0.05
    assert float(jnp.max(jnp.abs(B16 - B32))) < 0.05


def test_passive_state_columns(rng):
    """Model.n_passive declares leading states the dynamics is independent
    of; df/dx must be exactly zero there (the linearizer skips those jacfwd
    tangents, solvers/ilqr.py _linearize_knots)."""
    from trajopt_tpu.models import (Cartpole, DoubleIntegrator, DubinsCar,
                                    Quadrotor, Rocket)

    for model in (Quadrotor(), Cartpole(), DubinsCar(), Rocket(),
                  DoubleIntegrator(d=3)):
        npas = int(model.n_passive)
        assert npas > 0, type(model).__name__
        x = jnp.asarray(rng.standard_normal(model.n))
        u = jnp.asarray(rng.standard_normal(model.m))
        Af = jax.jacfwd(model.dynamics, argnums=0)(x, u, 0.0)
        assert np.allclose(Af[:, :npas], 0.0, atol=0.0), type(model).__name__


def test_quadrotor_batched_analytic_jacobian(rng):
    """dynamics_jacobian_batch (scatter-free concat assembly, the
    jacobian_mode="analytic1"/"analytic2" fast path) matches both the
    per-item closed form and jacfwd to round-off."""
    from trajopt_tpu.models import Quadrotor

    m = Quadrotor()
    xs = jnp.asarray(rng.standard_normal((7, 13)))
    xs = xs.at[:, 3:7].set(
        xs[:, 3:7] / jnp.linalg.norm(xs[:, 3:7], axis=-1, keepdims=True))
    us = jnp.asarray(rng.uniform(0.1, 2.0, (7, 4)))
    ts = jnp.zeros(7)
    Af, Bf = m.dynamics_jacobian_batch(xs, us, ts)
    Af_i, Bf_i = jax.vmap(m.dynamics_jacobian)(xs, us, ts)
    Af_ad = jax.vmap(jax.jacfwd(m.dynamics, argnums=0))(xs, us, ts)
    Bf_ad = jax.vmap(jax.jacfwd(m.dynamics, argnums=1))(xs, us, ts)
    assert np.allclose(Af, Af_i, atol=1e-12)
    assert np.allclose(Bf, Bf_i, atol=1e-12)
    assert np.allclose(Af, Af_ad, atol=1e-12)
    assert np.allclose(Bf, Bf_ad, atol=1e-12)
