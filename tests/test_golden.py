"""Golden-trajectory regression gates for the five BASELINE configs.

The BASELINE parity metric is a control-trajectory match to 1e-4 at N=101
(BASELINE.json north star).  Julia is not runnable in this environment, so
the recorded optima serve two roles: (1) regression gates across rounds —
any solver change that shifts the converged u-trajectory by more than the
parity tolerance fails here; (2) independent quality anchors where the
reference recorded numbers (Dubins parallel-park: Ipopt cost bound,
test/moi_test.jl:22-27 — checked in test_solve.py).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.solvers import ALTROSolver, SolverOptions

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CONFIGS = {
    "cartpole": (benchmarks.cartpole_swingup,
                 SolverOptions(cost_tolerance_intermediate=1e-2)),
    "dubins_parallel_park": (benchmarks.dubins_parallel_park,
                             SolverOptions(cost_tolerance_intermediate=1e-2)),
    "quickstart": (benchmarks.quickstart_problem, SolverOptions()),
    # Default solver modes (jacfwd linearization, error_state on for the
    # quaternion model — Altro's RigidBody behavior); the penalty options
    # mirror the reference's own example (Quadrotor.ipynb:
    # penalty_scaling=100, penalty_initial=0.1).
    "quadrotor_zigzag": (benchmarks.quadrotor_zigzag,
                         SolverOptions(penalty_scaling=100.0,
                                       penalty_initial=0.1)),
    "rocket": (benchmarks.rocket_landing, SolverOptions()),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_trajectory(name):
    builder, opts = CONFIGS[name]
    prob = builder()
    solver = ALTROSolver(prob, opts)
    sol = solver.solve()
    assert bool(sol.converged)
    us_gold = np.load(os.path.join(GOLDEN, f"{name}_us.npy"))
    J_gold, viol_gold = np.load(os.path.join(GOLDEN, f"{name}_meta.npy"))
    # u-trajectory parity tolerance (BASELINE: max |du| <= 1e-4), scaled by
    # the control magnitude for the rocket's ~100 N thrusts.
    scale = max(1.0, float(np.max(np.abs(us_gold))) / 10.0)
    assert float(jnp.max(jnp.abs(sol.us - us_gold))) <= 1e-4 * scale
    assert solver.cost() == pytest.approx(float(J_gold), rel=1e-5)
    assert solver.max_violation() < 1e-6
