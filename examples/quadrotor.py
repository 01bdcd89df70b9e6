"""Quadrotor zig-zag through waypoints (the reference's
examples/Quadrotor.ipynb), plus a batched MPC fleet demo.

Run:  python3 examples/quadrotor.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from trajopt_tpu.benchmarks import quadrotor_zigzag
from trajopt_tpu.solvers import ALTROSolver, SolverOptions

prob = quadrotor_zigzag()
opts = SolverOptions(penalty_scaling=100.0, penalty_initial=0.1)  # Quadrotor.ipynb
solver = ALTROSolver(prob, opts, show_summary=True)
sol = solver.solve()
print("final position:", sol.xs[-1, :3], "(target [0, 10, 1])")

# -- batched fleet: 8 perturbed scenarios in one vmapped solve --------------
from trajopt_tpu.parallel import batch_solve
from trajopt_tpu.solvers.altro import _problem_blocks

B = 8
key = jax.random.PRNGKey(0)
x0s = prob.x0[None, :] + 0.05 * jax.random.normal(key, (B, 13))
us0 = jnp.tile(prob.us[None], (B, 1, 1))
fleet = batch_solve(prob.model, prob.obj, _problem_blocks(prob), x0s, us0,
                    prob.times, prob.dts, opts)
print("fleet converged:", int(fleet.converged.sum()), "/", B,
      "mean iterations:", float(fleet.iterations.mean()))
