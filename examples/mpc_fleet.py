"""Receding-horizon MPC fleet: warm-started fixed-schedule re-solves for a
batch of controllers — the production cycle benchmarked in bench.py
(BASELINE config 5).

Run:  python3 examples/mpc_fleet.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import trajopt_tpu as to
from trajopt_tpu import mpc
from trajopt_tpu.models import DoubleIntegrator
from trajopt_tpu.parallel import batch_solve
from trajopt_tpu.solvers import ConstraintBlock, SolverOptions

model = DoubleIntegrator(d=2)
dm = to.discretize(model, "rk4")
n, m, N, tf = 4, 2, 21, 2.0
xf = jnp.array([0.0, 2.0, 0.0, 0.0])
obj = to.LQRObjective(jnp.ones(n), jnp.ones(m), 20 * jnp.ones(n), xf, N)
blocks = (
    ConstraintBlock(con=to.GoalConstraint.create(xf, m=m), inds=(N - 1,)),
    ConstraintBlock(con=to.BoundConstraint.create(n, m, u_min=-10, u_max=10),
                    inds=tuple(range(N - 1))),
)
times = jnp.linspace(0, tf, N)
dts = jnp.full(N, tf / (N - 1)).at[-1].set(0.0)
opts = SolverOptions()

B = 16
key = jax.random.PRNGKey(0)
x0s = 0.3 * jax.random.normal(key, (B, n))
sol = batch_solve(dm, obj, blocks, x0s, jnp.zeros((B, N, m)), times, dts, opts)
print(f"cold: {int(sol.converged.sum())}/{B} converged")

controller = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                     batched=True, schedule=(2, 1, 1))
for step in range(5):
    key, sub = jax.random.split(key)
    x_meas = sol.xs[:, 1] + 0.01 * jax.random.normal(sub, (B, n))
    sol = controller(x_meas, sol)
    print(f"step {step}: median viol "
          f"{float(jnp.median(sol.max_violation)):.2e}, "
          f"4-iteration fixed budget")
