"""Rocket soft landing with second-order-cone thrust constraints
(BASELINE config 4; the SOCP path from src/cones.jl + test/socp.jl).

Run:  python3 examples/rocket_socp.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.benchmarks import rocket_landing
from trajopt_tpu.solvers import ALTROSolver, SolverOptions

prob = rocket_landing()
solver = ALTROSolver(prob, SolverOptions(), show_summary=True)
sol = solver.solve()
u = sol.us[:-1]
print("landing error:", float(jnp.max(jnp.abs(sol.xs[-1]))))
print("max thrust   :", float(jnp.max(jnp.linalg.norm(u, axis=-1))),
      "(SOC limit", 3 * 10.0 * 9.81, ")")
in_cone = jnp.all(jnp.linalg.norm(u[:, :2], axis=-1) <= np.tan(np.pi / 4) * u[:, 2] + 1e-8)
print("pointing cone respected:", bool(in_cone))
