"""Hybrid model-vector tests, mirroring test/hybrid_dynamics_model.jl."""
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from trajopt_tpu import (
    BoundConstraint,
    ConstraintList,
    GoalConstraint,
    LQRCost,
    LQRObjective,
    Model,
    dims,
)
from trajopt_tpu.dynamics import discretize
from trajopt_tpu.hybrid import HybridModel, HybridProblem
from trajopt_tpu.solvers import solve_problem
from trajopt_tpu.solvers.options import SolverOptions


@struct.dataclass
class Model1(Model):
    """4-state 2-control double integrator (hybrid_dynamics_model.jl:26-28)."""
    n = 4
    m = 2

    def dynamics(self, x, u, t):
        return jnp.array([x[2], x[3], u[0], u[1]])


@struct.dataclass
class JumpMap(Model):
    """Dimension-changing jump map 4 -> 2 (hybrid_dynamics_model.jl:32-34)."""
    n = 4
    m = 2

    @property
    def output_dim(self):
        return 2

    def dynamics(self, x, u, t):
        return jnp.array([(x[2] + x[3]) / 2, (u[0] + u[1]) / 2])


@struct.dataclass
class Model2(Model):
    """2-state 1-control double integrator (hybrid_dynamics_model.jl:36-38)."""
    n = 2
    m = 1

    def dynamics(self, x, u, t):
        return jnp.array([x[1], u[0]])


def _models():
    return [Model1()] * 5 + [JumpMap()] + [Model2()] * 4


def test_dims():
    # hybrid_dynamics_model.jl:52-54
    nx, nu = dims(_models())
    assert nx == [4, 4, 4, 4, 4, 4, 2, 2, 2, 2, 2]
    assert nu == [2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1]


def test_dims_bad_vector():
    # no jump map -> DimensionMismatch (hybrid_dynamics_model.jl:60-65)
    with pytest.raises(ValueError, match="DimensionMismatch"):
        dims([Model1()] * 5 + [Model2()] * 5)


def test_constraint_list_per_knot_dims():
    # hybrid_dynamics_model.jl:85-98
    models = _models()
    cons = ConstraintList.from_models(models)
    bnd1 = BoundConstraint.create(4, 2, u_min=-4, u_max=4)
    bnd2 = BoundConstraint.create(2, 1, u_min=-2, u_max=2, x_max=[10, np.inf])
    goal = GoalConstraint.create(np.zeros(2), m=1)
    cons.add_constraint(bnd1, range(0, 5))
    cons.add_constraint(bnd2, range(6, 10))
    cons.add_constraint(goal, 10)
    assert list(cons.num_constraints()) == [4, 4, 4, 4, 4, 0, 3, 3, 3, 3, 2]
    # incompatible knot ranges raise (hybrid_dynamics_model.jl:97-98)
    with pytest.raises(ValueError, match="DimensionMismatch"):
        cons.add_constraint(bnd1, range(2, 8))
    with pytest.raises(ValueError, match="DimensionMismatch"):
        cons.add_constraint(bnd2, range(0, 3))


def test_hybrid_problem_construction_and_rollout():
    models = _models()
    nx, nu = dims(models)
    N = len(nx)
    costs = [
        LQRCost(np.ones(nx[k]), 0.1 * np.ones(max(nu[k], 1)), np.zeros(nx[k]))
        for k in range(N)
    ]
    prob = HybridProblem(models, costs, np.zeros(4), tf=2.0)
    assert (prob.n, prob.m) == (4, 2)  # padded dims
    assert prob.nx == nx and prob.nu == nu
    prob.initial_controls(0.1 * np.ones((N - 1, prob.m)))
    prob.rollout()

    # manual per-segment integration across the jump
    dt = 2.0 / (N - 1)
    m1, m2 = discretize(Model1()), discretize(Model2())
    x, t = np.zeros(4), 0.0
    for _ in range(5):
        x = np.asarray(m1.step(jnp.asarray(x), jnp.array([0.1, 0.1]), t, dt))
        t += dt
    xj = np.array([(x[2] + x[3]) / 2, 0.1])  # instantaneous jump
    assert np.allclose(np.asarray(prob.xs[6])[:2], xj, atol=1e-12)
    x2, t = xj, t + dt
    for _ in range(4):
        x2 = np.asarray(m2.step(jnp.asarray(x2), jnp.array([0.1]), t, dt))
        t += dt
    assert np.allclose(np.asarray(prob.xs[-1])[:2], x2, atol=1e-12)
    # padded dims stay identically zero after the jump
    assert np.all(np.asarray(prob.xs[6:])[:, 2:] == 0.0)


def test_hybrid_problem_bad_inputs():
    models = _models()
    # uniform objective of the wrong per-knot dims (hybrid_dynamics_model.jl:103-104)
    obj_bad = LQRObjective(np.ones(4), np.ones(2), np.ones(4), np.zeros(4), 11)
    with pytest.raises(ValueError, match="DimensionMismatch"):
        HybridProblem(models, obj_bad, np.zeros(4), tf=2.0)
    # uniform constraint list of the wrong dims (hybrid_dynamics_model.jl:106-108)
    nx, nu = dims(models)
    costs = [LQRCost(np.ones(nx[k]), 0.1 * np.ones(nu[k]), np.zeros(nx[k]))
             for k in range(11)]
    cons_bad = ConstraintList(3, 2, 11)
    with pytest.raises(ValueError, match="DimensionMismatch"):
        HybridProblem(models, costs, np.zeros(4), tf=2.0, constraints=cons_bad)
    # per-knot dims that disagree with the models (hybrid_dynamics_model.jl:110-115)
    nu_bad = list(nu)
    nu_bad[7] = 2
    cons_bad2 = ConstraintList(nx, nu_bad)
    with pytest.raises(ValueError, match="DimensionMismatch"):
        HybridProblem(models, costs, np.zeros(4), tf=2.0, constraints=cons_bad2)
    # wrong number of per-knot costs
    with pytest.raises(ValueError, match="DimensionMismatch"):
        HybridProblem(models, costs[:-1], np.zeros(4), tf=2.0)


def test_hybrid_solve_through_jump():
    """Constrained ALTRO solve across the dimension change — beyond the
    reference (which only constructs hybrid problems, never solves them)."""
    models = _models()
    nx, nu = dims(models)
    xg = np.array([1.0, 0.0])
    costs = [
        LQRCost(1e-2 * np.ones(nx[k]), 1e-1 * np.ones(nu[k]),
                np.zeros(nx[k]) if nx[k] == 4 else xg)
        for k in range(10)
    ]
    costs.append(LQRCost(100.0 * np.ones(2), np.zeros(1), xg))
    cons = ConstraintList(nx, nu)
    cons.add_constraint(BoundConstraint.create(4, 2, u_min=-6, u_max=6),
                        range(0, 5))
    cons.add_constraint(GoalConstraint.create(xg, m=1), 10)
    prob = HybridProblem(models, costs, np.zeros(4), tf=2.0, constraints=cons)
    sol = solve_problem(prob, SolverOptions(constraint_tolerance=1e-8))
    assert bool(sol.converged)
    assert np.allclose(np.asarray(sol.xs[-1])[:2], xg, atol=1e-6)
    # padded controls never activate
    assert np.abs(np.asarray(sol.us)[6:, 1]).max() < 1e-10
