"""Hybrid dimension-changing trajectory: two-phase ascent with a jump map.

Demonstrates the hybrid model-vector support (the reference's
hybrid_dynamics_model.jl, which only *constructs* such problems — here we
solve one): a 4-state / 2-control planar phase, an instantaneous jump map
that collapses the state to 2 dims and the control to 1 (e.g. a stage
separation keeping only vertical position/velocity), and a 2-state phase
steering to a goal under control bounds.

Run:  python3 examples/hybrid_ascent.py        (CPU f64)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from flax import struct

import trajopt_tpu as to
from trajopt_tpu.dynamics import Model
from trajopt_tpu.hybrid import HybridProblem
from trajopt_tpu.solvers import SolverOptions, solve_problem


@struct.dataclass
class TwoAxis(Model):
    """Planar double integrator: x = [px, pz, vx, vz], u = [ax, az]."""
    n = 4
    m = 2

    def dynamics(self, x, u, t):
        return jnp.array([x[2], x[3], u[0], u[1]])


@struct.dataclass
class Separation(Model):
    """Jump map 4 -> 2: keep the vertical channel, average the thrusts."""
    n = 4
    m = 2

    @property
    def output_dim(self):
        return 2

    def dynamics(self, x, u, t):
        return jnp.array([x[1], x[3]])  # [pz, vz]


@struct.dataclass
class OneAxis(Model):
    """Vertical double integrator: x = [pz, vz], u = [az]."""
    n = 2
    m = 1

    def dynamics(self, x, u, t):
        return jnp.array([x[1], u[0]])


def main():
    K1, K2 = 10, 10  # steps per phase
    models = [TwoAxis()] * K1 + [Separation()] + [OneAxis()] * K2
    nx, nu = to.dims(models)
    N = len(nx)
    print(f"per-knot dims: nx={nx}\n               nu={nu}")

    zg = np.array([5.0, 0.0])  # vertical goal after separation
    costs = [
        to.LQRCost(1e-2 * np.ones(nx[k]), 1e-1 * np.ones(nu[k]),
                   np.zeros(nx[k]) if nx[k] == 4 else zg)
        for k in range(N - 1)
    ]
    costs.append(to.LQRCost(100.0 * np.ones(2), np.zeros(1), zg))

    cons = to.ConstraintList(nx, nu)
    cons.add_constraint(to.BoundConstraint.create(4, 2, u_min=-8, u_max=8),
                        range(0, K1))
    cons.add_constraint(to.BoundConstraint.create(2, 1, u_min=-4, u_max=4),
                        range(K1 + 1, N - 1))
    cons.add_constraint(to.GoalConstraint.create(zg, m=1), N - 1)

    prob = HybridProblem(models, costs, np.zeros(4), tf=4.0, constraints=cons)
    sol = solve_problem(prob, SolverOptions(constraint_tolerance=1e-8))

    xs = np.asarray(sol.xs)
    print(f"converged: {bool(sol.converged)}  "
          f"max_violation: {float(sol.max_violation):.2e}")
    print(f"state before separation (4-dim): {xs[K1]}")
    print(f"state after  separation (2-dim): {xs[K1 + 1][:2]}")
    print(f"terminal [pz, vz]: {xs[-1][:2]}  (goal {zg})")
    assert bool(sol.converged)
    assert np.allclose(xs[-1][:2], zg, atol=1e-6)
    print("OK")


if __name__ == "__main__":
    main()
