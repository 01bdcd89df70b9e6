"""SampledTrajectory / KnotPoint containers and the free-function API
(the reference's exported method surface,
/root/reference/src/TrajectoryOptimization.jl:41-57)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import DoubleIntegrator
from trajopt_tpu.solvers import ALTROSolver, SolverOptions


def _make_problem(N=11, tf=2.0):
    model = DoubleIntegrator(d=2)
    n, m = model.n, model.m
    xf = jnp.array([1.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), 0.1 * jnp.ones(m), 10.0 * jnp.ones(n),
                          xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    cons.add_constraint(
        to.BoundConstraint.create(n, m, u_min=-10.0, u_max=10.0),
        range(N - 1))
    return to.Problem(model, obj, jnp.zeros(n), tf=tf, xf=xf,
                      constraints=cons)


def test_sampled_trajectory_accessors():
    N, n, m = 7, 4, 2
    xs = jnp.arange(N * n, dtype=jnp.float32).reshape(N, n)
    us = jnp.arange((N - 1) * m, dtype=jnp.float32).reshape(N - 1, m)
    traj = to.SampledTrajectory.create(xs, us, tf=3.0)
    assert traj.N == N and traj.n == n and traj.m == m
    assert len(traj) == N
    # N-1 controls padded with a zero terminal row; controls() drops it.
    assert traj.us.shape == (N, m)
    np.testing.assert_allclose(traj.controls(), us)
    np.testing.assert_allclose(traj.states(), xs)
    np.testing.assert_allclose(traj.gettimes(), np.linspace(0, 3.0, N),
                               atol=1e-6)
    assert float(traj.tf) == pytest.approx(3.0)
    # Traj is the reference's exported alias.
    assert to.Traj is to.SampledTrajectory


def test_knotpoint_terminal_semantics():
    # terminal knot: dt == 0, is_terminal true (test/cost_tests.jl:8-9).
    traj = to.SampledTrajectory.create(jnp.zeros((5, 3)), jnp.ones((4, 2)),
                                       dt=0.1)
    z = traj[4]
    assert isinstance(z, to.KnotPoint)
    assert bool(z.is_terminal)
    assert not bool(traj[0].is_terminal)
    assert float(traj[2].t) == pytest.approx(0.2)
    np.testing.assert_allclose(traj[1].z, jnp.concatenate([traj.xs[1],
                                                           traj.us[1]]))
    assert [float(k.dt) for k in traj] == pytest.approx([0.1] * 4 + [0.0])


def test_uneven_dt_and_time_shift():
    dts = [0.1, 0.3, 0.2]
    traj = to.SampledTrajectory.create(jnp.zeros((4, 2)), jnp.zeros((3, 1)),
                                       dt=dts)
    np.testing.assert_allclose(traj.gettimes(), [0.0, 0.1, 0.4, 0.6],
                               atol=1e-7)
    shifted = traj.set_initial_time(1.0)
    np.testing.assert_allclose(shifted.gettimes(), [1.0, 1.1, 1.4, 1.6],
                               atol=1e-6)


def test_trajectory_is_pytree():
    traj = to.SampledTrajectory.create(jnp.zeros((5, 3)), jnp.zeros((5, 2)),
                                       tf=1.0)
    doubled = jax.jit(lambda t: jax.tree_util.tree_map(lambda a: 2 * a, t))(
        traj)
    assert isinstance(doubled, to.SampledTrajectory)
    # shift() inside jit (the MPC warm start path)
    shifted = jax.jit(lambda t: t.shift())(traj)
    assert shifted.xs.shape == traj.xs.shape


def test_free_function_api_on_problem():
    prob = _make_problem()
    assert to.state_dim(prob) == 4 and to.control_dim(prob) == 2
    assert to.horizonlength(prob) == 11
    assert to.get_model(prob) is prob.model
    assert to.get_objective(prob) is prob.obj
    assert to.get_constraints(prob) is prob.constraints
    np.testing.assert_allclose(to.gettimes(prob), prob.times)

    us = 0.5 * jnp.ones((prob.N, prob.m))
    to.initial_controls(prob, us)
    to.rollout(prob)  # dispatches to Problem.rollout
    np.testing.assert_allclose(to.states(prob), prob.xs)
    np.testing.assert_allclose(to.controls(prob), prob.us[:-1])
    assert float(to.cost(prob)) == pytest.approx(float(prob.cost()))

    traj = to.get_trajectory(prob)
    assert isinstance(traj, to.SampledTrajectory)
    np.testing.assert_allclose(traj.xs, prob.xs)
    np.testing.assert_allclose(traj.times, prob.times)

    # low-level rollout dispatch still works
    xs = to.rollout(prob.model, prob.x0, prob.us, prob.times, prob.dts)
    np.testing.assert_allclose(xs, prob.xs, atol=1e-6)


def test_max_violation_free_function():
    prob = _make_problem()
    prob.initial_controls(20.0 * jnp.ones((prob.N, prob.m)))
    prob.rollout()
    v = float(to.max_violation(prob))
    # control bound violated by 10, goal violated by more
    assert v >= 10.0
    # solved problem: violation below tolerance, solver interface agrees
    solver = ALTROSolver(_make_problem(),
                         SolverOptions(constraint_tolerance=1e-6))
    solver.solve()
    assert float(to.max_violation(solver)) < 1e-6
    solved_viol = float(to.max_violation(
        solver.prob, xs=solver.solution.xs, us=solver.solution.us))
    assert solved_viol < 1e-6


def test_initial_trajectory_from_traj():
    prob = _make_problem()
    traj = to.SampledTrajectory.create(
        jnp.ones((prob.N, prob.n)), 2 * jnp.ones((prob.N, prob.m)), tf=2.0)
    to.initial_trajectory(prob, traj)
    np.testing.assert_allclose(prob.xs, 1.0)
    np.testing.assert_allclose(prob.us, 2.0)
