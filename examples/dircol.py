"""Direct collocation (DIRCOL) on the Dubins parallel-park problem.

The reference solved this configuration with Ipopt through the (removed)
MOI layer and recorded the optimum as a quality anchor:
cost < 0.0541, max_violation < 1e-11 (/root/reference/test/moi_test.jl:21-27).
Here the same problem goes through the DIRCOL solver from the reference's
solver catalogue (/root/reference/docs/old/solvers.md "Direct Collocation"):
Hermite-Simpson collocation defects over the flattened TrajOptNLP, solved as
a sparse host-side NLP with jit-compiled JAX oracles — then cross-checked
against the TPU-path ALTRO solver.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # host validation path: CPU + f64
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from trajopt_tpu.benchmarks import dubins_parallel_park
from trajopt_tpu.solvers import (
    ALTROSolver, DIRCOLOptions, DIRCOLSolver, SolverOptions,
)

N = 61
prob = dubins_parallel_park(N=N).rollout()

solver = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=500))
xs, us = solver.solve()
dt = prob.tf / (N - 1)
print(f"DIRCOL   : cost*dt {solver.cost() * dt:.5f}  "
      f"max_violation {solver.max_violation():.2e}  "
      f"iters {solver.iterations()}  converged {solver.converged()}")

altro = ALTROSolver(dubins_parallel_park(N=N),
                    SolverOptions(constraint_tolerance=1e-8,
                                  projected_newton=True))
altro.solve()
print(f"ALTRO    : cost*dt {float(altro.cost()) * dt:.5f}  "
      f"max_violation {float(altro.max_violation()):.2e}")

assert solver.max_violation() < 1e-8
err = abs(solver.cost() - float(altro.cost())) / float(altro.cost())
print(f"relative cost gap DIRCOL vs ALTRO: {err:.2%} "
      f"(different transcriptions: HS/FOH vs RK4/ZOH)")
assert err < 0.05
