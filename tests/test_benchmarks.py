"""Benchmark-config builders solve end-to-end (BASELINE configs beyond the
golden-gated five: the extra Dubins scenarios from test/test_models.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.solvers import ALTROSolver, SolverOptions


def test_dubins_three_obstacles():
    prob = benchmarks.dubins_three_obstacles()
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    # all three obstacles respected
    xs = sol.xs
    for cx, cy in zip(3 * np.array([0.25, 0.5, 0.75]),
                      3 * np.array([0.25, 0.5, 0.75])):
        d = jnp.sqrt((xs[1:-1, 0] - cx) ** 2 + (xs[1:-1, 1] - cy) ** 2)
        assert float(jnp.min(d)) > 0.25 + 0.175 - 1e-6
    assert float(jnp.linalg.norm(sol.xs[-1] - prob.xf)) < 1e-6


def test_dubins_escape():
    prob = benchmarks.dubins_escape()
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    assert float(jnp.linalg.norm(sol.xs[-1] - prob.xf)) < 1e-6


def test_error_quadratic_cost():
    """ErrorQuadratic (lie_costs.jl:178-278): tangent-space quadratic via
    state_diff; zero at the reference, AD-consistent expansion."""
    import trajopt_tpu as to
    from trajopt_tpu.models import Quadrotor

    model = Quadrotor()
    x_ref = Quadrotor.build_state([1.0, 2.0, 3.0])
    cost = to.ErrorQuadratic.create(model, jnp.ones(12), 0.1 * jnp.ones(4), x_ref)
    u = jnp.zeros(4)
    assert float(cost.stage_cost(x_ref, u)) == pytest.approx(0.0, abs=1e-12)
    x = Quadrotor.build_state([1.1, 2.0, 3.0], quat=[0.99875, 0.05, 0.0, 0.0])
    e = cost.expansion(x, u)
    gx = jax.grad(lambda x_: cost.stage_cost(x_, u))(x)
    assert np.allclose(e.x, gx, atol=1e-10)
    assert float(cost.stage_cost(x, u)) > 0


def test_error_quadratic_addition_and_change_dimension():
    """lie_costs.jl:242-278: ErrorQuadratic + QuadraticCost folds the plain
    quadratic in (quaternion row removed for 13-dim Q); change_dimension
    zero-pads trailing dims and the padded cost evaluates the appended raw
    states quadratically."""
    import trajopt_tpu as to
    from trajopt_tpu.costs import change_dimension
    from trajopt_tpu.models import Quadrotor

    model = Quadrotor()
    x_ref = Quadrotor.build_state([1.0, 2.0, 3.0])
    eq = to.ErrorQuadratic.create(model, jnp.ones(12), 0.1 * jnp.ones(4), x_ref)
    u = 0.3 * jnp.ones(4)
    x = Quadrotor.build_state([1.1, 2.0, 3.0], quat=[0.99875, 0.05, 0.0, 0.0])

    # full-dim ctor Q: first quaternion row dropped (lie_costs.jl:226-229)
    eq13 = to.ErrorQuadratic.create(model, jnp.arange(1.0, 14.0),
                                    0.1 * jnp.ones(4), x_ref)
    assert eq13.Qd.shape == (12,)
    assert np.allclose(eq13.Qd, np.delete(np.arange(1.0, 14.0), 3))

    # addition with a 13-dim diagonal quadratic (rm_quat drops row 7, 1-based)
    dc = to.DiagonalCost.create(Qd=2.0 * jnp.ones(13), Rd=jnp.ones(4))
    both = eq + dc
    assert both.Qd.shape == (12,)
    expected = float(eq.stage_cost(x, u)) + float(
        jnp.sum(jnp.delete(2.0 * jnp.ones(13), 6)
                * eq._err(x) ** 2) * 0.5 + 0.5 * jnp.sum(u * u))
    assert float(both.stage_cost(x, u)) == pytest.approx(expected, rel=1e-6)
    # commutes (lie_costs.jl:278)
    assert float((dc + eq).stage_cost(x, u)) == pytest.approx(expected, rel=1e-6)

    # change_dimension: pad 2 states + 1 control with zero weight
    big = change_dimension(eq, 15, 5)
    assert big.n == 15 and big.m == 5
    xp = jnp.concatenate([x, jnp.array([7.0, -3.0])])
    up = jnp.concatenate([u, jnp.array([9.0])])
    assert float(big.stage_cost(xp, up)) == pytest.approx(
        float(eq.stage_cost(x, u)), rel=1e-6)
    gx = jax.grad(lambda x_: big.stage_cost(x_, up))(xp)
    assert np.allclose(big.expansion(xp, up).x, gx, atol=1e-10)
