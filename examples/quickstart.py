"""Quickstart: the reference's examples/quickstart.jl, end to end.

Defines a 2-D double integrator, builds the LQR objective and the
goal/obstacle/SOC/bound constraint list, checks the cost and rollout
identities, and solves with ALTRO.

Run:  python3 examples/quickstart.py        (CPU f64)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from flax import struct

import trajopt_tpu as to
from trajopt_tpu.dynamics import Model
from trajopt_tpu.solvers import ALTROSolver, SolverOptions


# -- Model definition (quickstart.jl:11-23) ---------------------------------
@struct.dataclass
class DoubleIntegrator(Model):
    mass: float = 1.0
    n = 4
    m = 2

    def dynamics(self, x, u, t):
        return jnp.concatenate([x[2:], u / self.mass])


model = DoubleIntegrator()
n, m = model.n, model.m
tf, N = 3.0, 21

# -- Objective (quickstart.jl:36-42) ----------------------------------------
x0 = jnp.zeros(n)
xf = jnp.array([0.0, 2.0, 0.0, 0.0])
Q = jnp.ones(n)
R = jnp.ones(m)
Qf = Q * (N - 1)
obj = to.LQRObjective(Q, R, Qf, xf, N)

# -- Constraints (quickstart.jl:52-56) --------------------------------------
cons = to.ConstraintList(n, m, N)
cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
cons.add_constraint(to.CircleConstraint.create(n, [0.0], [1.0], [0.5], m=m),
                    range(1, N - 1))
cons.add_constraint(to.NormConstraint.create(n, m, 5.0, to.SecondOrderCone,
                                             "control"), range(N - 1))
cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-10, u_max=10),
                    range(N - 1))

# -- Problem + identities (quickstart.jl:59-96) -----------------------------
prob = to.Problem(model, obj, x0, tf, xf=xf, constraints=cons)
U0 = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (N - 1, m))
prob.initial_controls(U0)
prob.initial_states(jnp.zeros((N, n)))

J = prob.cost()
J_manual = sum(
    0.5 * (prob.xs[k] - xf) @ (Q * (prob.xs[k] - xf)) + 0.5 * prob.us[k] @ (R * prob.us[k])
    for k in range(N - 1)
) + 0.5 * (prob.xs[-1] - xf) @ (Qf * (prob.xs[-1] - xf))
assert abs(float(J - J_manual)) < 1e-9, "cost identity (quickstart.jl:72-80)"

prob.rollout()
x = x0
for k in range(N - 1):
    x = prob.model.step(x, prob.us[k], prob.times[k], prob.dts[k])
assert float(jnp.max(jnp.abs(prob.xs[-1] - x))) < 1e-12, "rollout identity"

# -- Solve ------------------------------------------------------------------
solver = ALTROSolver(prob, SolverOptions(), show_summary=True)
sol = solver.solve()
X, U = solver.states(), solver.controls()
print("goal error:", float(jnp.max(jnp.abs(X[-1] - xf))))
print("max ||u||  :", float(jnp.max(jnp.linalg.norm(U, axis=-1))), "(SOC limit 5.0)")
