"""The reference's hard DubinsCar configs, solved end-to-end, plus the
cartpole Ipopt quality anchor (VERDICT r1 #3).

- dubins_three_obstacles: /root/reference/test/test_models.jl:36-77
- dubins_escape (120-obstacle corridor, infeasible start):
  /root/reference/test/test_models.jl:145-223
- cartpole Ipopt bound (cost < 1.50, max_violation < 1e-11):
  /root/reference/test/moi_test.jl:39-40
"""
import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu import benchmarks
from trajopt_tpu.solvers import ALTROSolver, SolverOptions


def _min_clearance(prob, xs):
    """Most-violated circle-constraint value over the trajectory (<= 0 means
    every obstacle cleared)."""
    con = prob.constraints.constraints[0]
    c = jax.vmap(con.evaluate)(xs, jnp.zeros((xs.shape[0], prob.m), xs.dtype))
    return float(jnp.max(c))


def test_dubins_three_obstacles_solve():
    prob = benchmarks.dubins_three_obstacles()
    sol = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2)
                      ).solve()
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    xs = sol.xs
    assert float(jnp.linalg.norm(xs[-1] - prob.xf)) < 1e-6
    assert _min_clearance(prob, xs[1:-1]) <= 1e-6
    # forward-velocity bound active region: u1 in [0, 3]
    assert float(jnp.min(sol.us[:-1, 0])) >= -1e-6


def test_dubins_escape_infeasible_start():
    """The 120-obstacle corridor with the interpolated state guess and the
    ALTRO slack-augmented infeasible start (the reference's scenario).
    Phase 1 must reproduce-then-repair the guess; a too-soft initial
    penalty lets the slacks 'teleport' through the wall, so the config
    binds constraints from the start (penalty_initial=10)."""
    prob = benchmarks.dubins_escape()
    sol = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2,
                                          penalty_initial=10.0,
                                          infeasible=True)).solve()
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    xs = np.asarray(sol.xs)
    assert np.linalg.norm(xs[-1] - np.asarray(prob.xf)) < 1e-5
    assert _min_clearance(prob, sol.xs[1:-1]) <= 1e-6
    # the only way out is over the wall: the path must cross y > 5 through
    # the (3, 5)..(5, 5) gap and come back down to the goal
    assert xs[:, 1].max() > 5.0
    # dynamically consistent: no teleporting (bounded dubins speed * dt)
    assert np.abs(np.diff(xs[:, :2], axis=0)).max() < 5.0 * (3.0 / 100) + 1e-6


def test_dubins_escape_state_guess_only():
    """Without the slack augmentation the interpolated guess alone also
    steers the solver through the corridor (xs_init warm start)."""
    prob = benchmarks.dubins_escape()
    sol = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2)
                      ).solve()
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    assert _min_clearance(prob, sol.xs[1:-1]) <= 1e-6
    assert float(sol.xs[:, 1].max()) > 5.0


def test_cartpole_ipopt_anchor():
    """Independent quality gate: the reference's recorded Ipopt optimum for
    cartpole swing-up — cost < 1.50 in the v0.5 dt-scaled semantics,
    max_violation < 1e-11 with the projected-Newton polish
    (moi_test.jl:39-40)."""
    prob = benchmarks.cartpole_swingup()
    sol = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2,
                                          projected_newton=True)).solve()
    assert bool(sol.converged)
    dt = 5.0 / 100
    assert float(sol.J) * dt < 1.50
    assert float(sol.max_violation) < 1e-11
