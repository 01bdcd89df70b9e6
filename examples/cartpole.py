"""Cartpole swing-up (the reference's examples/Cartpole.ipynb).

Run:  python3 examples/cartpole.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from trajopt_tpu.benchmarks import cartpole_swingup
from trajopt_tpu.solvers import ALTROSolver, SolverOptions

prob = cartpole_swingup()
opts = SolverOptions(
    cost_tolerance_intermediate=1e-2,  # Cartpole.ipynb SolverOptions
    penalty_scaling=10.0,
    penalty_initial=1.0,
)
solver = ALTROSolver(prob, opts, show_summary=True)
solver.solve()
print("max_violation:", solver.max_violation())
print("cost:         ", solver.cost())
print("iterations:   ", solver.iterations())
