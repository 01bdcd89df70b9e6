"""The five BASELINE benchmark problem configurations (BASELINE.json
"configs"), as reusable builders.

Each returns a fully-populated :class:`~trajopt_tpu.problem.Problem` with the
reference's exact weights/limits (file:line cited per config), ready for
``ALTROSolver`` or the batched/sharded solvers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import (
    BoundConstraint, CircleConstraint, ConstraintList, GoalConstraint,
    LQRObjective, NormConstraint, Problem, SecondOrderCone,
)
from .costs import LQRCost
from .objective import Objective
from .models import Cartpole, DoubleIntegrator, DubinsCar, Quadrotor, Rocket
from .models.rocket import thrust_cone_constraint

__all__ = [
    "quickstart_problem",
    "cartpole_swingup",
    "dubins_parallel_park",
    "dubins_three_obstacles",
    "dubins_escape",
    "quadrotor_zigzag",
    "rocket_landing",
]


def quickstart_problem(N: int = 21, tf: float = 3.0, dtype=None) -> Problem:
    """2-D double-integrator block move with goal + circular obstacle + SOC
    control norm + control bounds (examples/quickstart.jl:25-59)."""
    model = DoubleIntegrator(d=2)
    n, m = 4, 2
    x0 = jnp.zeros(n, dtype)
    xf = jnp.array([0.0, 2.0, 0.0, 0.0], dtype)
    obj = LQRObjective(jnp.ones(n), jnp.ones(m), (N - 1) * jnp.ones(n), xf, N,
                       dtype=dtype)
    cons = ConstraintList(n, m, N)
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    cons.add_constraint(CircleConstraint.create(n, [0.0], [1.0], [0.5], m=m),
                        range(1, N - 1))
    cons.add_constraint(NormConstraint.create(n, m, 5.0, SecondOrderCone,
                                              "control"), range(N - 1))
    cons.add_constraint(BoundConstraint.create(n, m, u_min=-10, u_max=10),
                        range(N - 1))
    prob = Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    # break the obstacle's left/right symmetry (the quickstart does this with
    # random initial controls, quickstart.jl:63)
    prob.initial_controls(
        0.01 * jax.random.normal(jax.random.PRNGKey(1), (N - 1, m)))
    return prob


def cartpole_swingup(N: int = 101, tf: float = 5.0, dtype=None) -> Problem:
    """Cartpole swing-up with control bounds + goal
    (examples/Cartpole.ipynb; test/test_models.jl:4-32)."""
    model = Cartpole()
    n, m = 4, 1
    xf = jnp.array([0.0, np.pi, 0.0, 0.0], dtype)
    obj = LQRObjective(1e-2 * jnp.ones(n), 1e-1 * jnp.ones(m),
                       100.0 * jnp.ones(n), xf, N, dtype=dtype)
    cons = ConstraintList(n, m, N)
    cons.add_constraint(BoundConstraint.create(n, m, u_min=-3.0, u_max=3.0),
                        range(N - 1))
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    prob = Problem(model, obj, jnp.zeros(n, dtype), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.01, dtype))
    return prob


def dubins_parallel_park(N: int = 101, tf: float = 3.0, dtype=None) -> Problem:
    """DubinsCar parallel park (test/test_models.jl:105-143); quality bound
    cost*dt < 0.0541, max_violation < 1e-11 (test/moi_test.jl:22-27)."""
    model = DubinsCar()
    n, m = 3, 2
    xf = jnp.array([0.0, 1.5, 0.0], dtype)
    obj = LQRObjective(1e-2 * jnp.ones(n), 1e-2 * jnp.ones(m),
                       100.0 * jnp.ones(n), xf, N, dtype=dtype)
    cons = ConstraintList(n, m, N)
    cons.add_constraint(BoundConstraint.create(n, m, u_min=-2.0, u_max=2.0),
                        range(N - 1))
    cons.add_constraint(
        BoundConstraint.create(n, m, x_min=[-0.25, -0.001, -np.inf],
                               x_max=[0.25, 1.501, np.inf]), range(1, N - 1))
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    prob = Problem(model, obj, jnp.zeros(n, dtype), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.1, dtype))
    return prob


def dubins_three_obstacles(N: int = 101, tf: float = 5.0, dtype=None) -> Problem:
    """DubinsCar among three circular obstacles (test/test_models.jl:36-77)."""
    model = DubinsCar()
    n, m = 3, 2
    x0 = jnp.zeros(n, dtype)
    xf = jnp.array([3.0, 3.0, 0.0], dtype)
    obj = LQRObjective(jnp.ones(n), jnp.array([0.5, 0.5]), 10.0 * jnp.ones(n),
                       xf, N, dtype=dtype)
    r = 0.25 + model.radius
    cons = ConstraintList(n, m, N)
    cons.add_constraint(
        CircleConstraint.create(n, 3 * np.array([0.25, 0.5, 0.75]),
                                3 * np.array([0.25, 0.5, 0.75]),
                                np.full(3, r), m=m), range(1, N - 1))
    cons.add_constraint(BoundConstraint.create(n, m, u_min=[0, -3], u_max=[3, 3]),
                        range(N - 1))
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    prob = Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.01, dtype))
    return prob


def dubins_escape(N: int = 101, tf: float = 3.0, dtype=None) -> Problem:
    """DubinsCar escape through a 120-obstacle corridor
    (test/test_models.jl:145-223), with the interpolated state guess."""
    model = DubinsCar()
    n, m = 3, 2
    x0 = jnp.array([2.5, 2.5, 0.0], dtype)
    xf = jnp.array([7.5, 2.5, 0.0], dtype)
    obj = LQRObjective(1e-3 * jnp.ones(n), 1e-2 * jnp.ones(m),
                       100.0 * jnp.ones(n), xf, N, dtype=dtype)
    r = 0.5
    s1, s2, s3 = 30, 50, 15
    circles = []
    for i in np.linspace(0, 5, s1):
        circles.append((0.0, i, r))
    for i in np.linspace(0, 5, s1):
        circles.append((5.0, i, r))
    for i in np.linspace(0, 5, s1):
        circles.append((10.0, i, r))
    for i in np.linspace(0, 10, s2):
        circles.append((i, 0.0, r))
    for i in np.linspace(0, 3, s3):
        circles.append((i, 5.0, r))
    for i in np.linspace(5, 8, s3):
        circles.append((i, 5.0, r))
    cx, cy, cr = map(np.array, zip(*circles))
    cons = ConstraintList(n, m, N)
    cons.add_constraint(CircleConstraint.create(n, cx, cy, cr, m=m),
                        range(1, N - 1))
    cons.add_constraint(BoundConstraint.create(n, m, u_min=-5.0, u_max=5.0),
                        range(N - 1))
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    prob = Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.ones((N - 1, m), dtype))
    # interpolated waypoint guess (test/test_models.jl:212-218)
    guess = np.array([[2.5, 2.5, 0.0], [4.0, 5.0, 0.785], [5.0, 6.25, 0.0],
                      [7.5, 6.25, -0.261], [9.0, 5.0, -1.57], [7.5, 2.5, 0.0]])
    t_way = np.linspace(0, N - 1, len(guess))
    X0 = np.stack([np.interp(np.arange(N), t_way, guess[:, j]) for j in range(3)],
                  axis=1)
    prob.initial_states(jnp.asarray(X0, dtype))
    return prob


def quadrotor_zigzag(N: int = 101, tf: float = 5.0, dtype=None) -> Problem:
    """Quadrotor zig-zag through waypoints with control bounds
    (examples/Quadrotor.ipynb, the reference's headline example)."""
    model = Quadrotor()
    n, m = 13, 4
    x0 = Quadrotor.build_state([0, -10, 1.0])
    xf = Quadrotor.build_state([0, 10, 1.0])
    wpts = [jnp.array([10.0, 0, 1.0]), jnp.array([-10.0, 0, 1.0]),
            jnp.array([0.0, 10, 1.0])]
    wpt_knots = [32, 65, 100]  # 0-based (33, 66, 101 in the notebook)
    Q = jnp.concatenate([jnp.full(3, 1e-5), jnp.full(4, 1e-5),
                         jnp.full(3, 1e-3), jnp.full(3, 1e-3)])
    R = jnp.full(m, 1e-4)
    Qw = jnp.concatenate([jnp.full(3, 1e3), jnp.full(4, 1.0),
                          jnp.full(3, 1.0), jnp.full(3, 1.0)])
    Qf = jnp.concatenate([jnp.full(3, 10.0), jnp.full(4, 100.0),
                          jnp.full(3, 10.0), jnp.full(3, 10.0)])
    x_nom = Quadrotor.build_state([0, 0, 0])
    costs = []
    for k in range(N):
        if k in wpt_knots:
            i = wpt_knots.index(k)
            Qk = Qf if k == N - 1 else 1e-3 * Qw
            costs.append(LQRCost(Qk, R, Quadrotor.build_state(wpts[i]),
                                 dtype=dtype))
        else:
            costs.append(LQRCost(Q, R, x_nom, dtype=dtype))
    obj = Objective.from_costs(costs)
    cons = ConstraintList(n, m, N)
    cons.add_constraint(BoundConstraint.create(n, m, u_min=0.0, u_max=12.0),
                        range(N - 1))
    prob = Problem(model, obj, jnp.asarray(x0, dtype), tf, xf=jnp.asarray(xf, dtype),
                   constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.5 * model.mass / m, dtype))
    return prob


def rocket_landing(N: int = 101, tf: float = 10.0, dtype=None) -> Problem:
    """Rocket soft landing with SOC thrust-magnitude and pointing-cone
    constraints (BASELINE config 4; SOC machinery from src/cones.jl +
    test/socp.jl)."""
    model = Rocket(mass=10.0)
    n, m = 6, 3
    x0 = jnp.array([4.0, 2.0, 20.0, -3.0, 2.0, -5.0], dtype)
    xf = jnp.zeros(n, dtype)
    obj = LQRObjective(1e-2 * jnp.ones(n), 1e-1 * jnp.ones(m),
                       100.0 * jnp.ones(n), xf, N, dtype=dtype)
    g = 9.81
    cons = ConstraintList(n, m, N)
    cons.add_constraint(GoalConstraint.create(xf, m=m), N - 1)
    cons.add_constraint(NormConstraint.create(n, m, 3 * model.mass * g,
                                              SecondOrderCone, "control"),
                        range(N - 1))
    cons.add_constraint(thrust_cone_constraint(n, m, np.pi / 4), range(N - 1))
    prob = Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    prob.initial_controls(
        jnp.tile(jnp.array([0.0, 0.0, model.mass * g], dtype), (N - 1, 1)))
    return prob
