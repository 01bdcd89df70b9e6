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
