"""Internal API tour — the solver-author's view of the framework.

Mirrors the reference's examples/"Internal API.ipynb": evaluate the
dynamics, objective, and constraints the way a custom solver would, on the
quadrotor (13-state quaternion model, error-state dimension 12).  Where the
notebook mutates pre-allocated expansion storage (``DynamicsExpansion``,
``CostExpansion``, ``ConVal``), the TPU-native analog is pure traced
functions returning batched tensors — same math, no storage protocol.

Run:  python3 examples/internal_api.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import trajopt_tpu as to
from trajopt_tpu.models import Quadrotor

# --- Create a Problem (notebook "Create a Problem" cell) -------------------
model = Quadrotor()
n, m = model.n, model.m                    # 13 states, 4 controls
nbar = model.errstate_dim                  # 12-dim error state
N, tf = 51, 5.0

x0 = Quadrotor.build_state([1.0, 2.0, 1.0])
xf = Quadrotor.build_state([0.0, 0.0, 2.0])
obj = to.LQRObjective(0.1 * jnp.ones(n), 0.01 * jnp.ones(m),
                      100.0 * jnp.ones(n), xf, N)

cons = to.ConstraintList(n, m, N)
cons = to.add_constraint(
    cons, to.BoundConstraint.create(n, m, u_min=0.0, u_max=10.0),
    range(N - 1))
cons = to.add_constraint(
    cons, to.CircleConstraint.create(n, [1.0, 2.0], [1.0, 2.0], [0.1, 0.1]),
    range(N - 1))
cons = to.add_constraint(
    cons, to.GoalConstraint.create(xf, inds=(0, 1, 2), m=m), [N - 1])
prob = to.Problem(model, obj, x0, tf, xf=xf, constraints=cons)

# initialize the controls: scalar broadcast / per-knot matrix both accepted
u_hover = jnp.full(m, 0.25 * model.mass * 9.81)
prob = prob.initial_controls(u_hover)                       # broadcast
prob = prob.initial_controls(jnp.tile(u_hover, (N - 1, 1)))  # (N-1, m)

# --- Simulating the dynamics (rollout! problem.jl:330-340) -----------------
prob = prob.rollout()
assert np.allclose(prob.states(0), prob.x0)
print("rollout final state:", np.asarray(prob.states(N - 1))[:3])

# --- Dynamics Jacobians (notebook DynamicsExpansion cells) -----------------
# One batched call replaces the per-knot dynamics_expansion! loop: A is
# (N-1, n, n), B is (N-1, n, m), via jacfwd through the RK4 integrator.
A, B = to.linearize(prob.model, prob.xs, prob.us, prob.times, prob.dts)
print("dynamics Jacobians:", A.shape, B.shape)

# Error-state Jacobians (RD.state_diff_jacobian! + TO.error_expansion!):
# E(x) is (n, nbar); error dynamics A~ = E(x')^T A E(x), B~ = E(x')^T B.
E = jax.vmap(model.errstate_jacobian)(prob.xs)              # (N, n, nbar)
A_err = jnp.einsum("kij,kil,kjp->klp", A, E[1:], E[:-1])
B_err = jnp.einsum("kij,kil->klj", B, E[1:])
assert A_err.shape == (N - 1, nbar, nbar)
print("error-state dynamics Jacobians:", A_err.shape, B_err.shape)

# --- Computing the cost (cost! / get_J, objective.jl:89-106) ---------------
J = prob.cost()
Jk = prob.obj.get_J(prob.xs, prob.us)      # per-knot cost vector (get_J)
assert np.isclose(float(J), float(Jk.sum()))
stage0 = prob.obj.cost_at(0).stage_cost(prob.states(0), prob.controls(0))
assert np.isclose(float(Jk[0]), float(stage0))
print(f"cost: {float(J):.4f}  (sum of {N} per-knot terms, J[0]={float(Jk[0]):.4f})")

# --- Cost expansion (TO.cost_expansion!) -----------------------------------
# One batched expansion replaces gradient!/hessian! per knot: stacked
# (N, n, n)/(N, m, m)/(N, m, n) Hessian blocks + gradients.  Terminal knot
# drops the control terms (cost_functions.jl:92,141).
exp = prob.obj.expansion(prob.xs, prob.us)
print("cost expansion blocks:", exp.xx.shape, exp.uu.shape, exp.ux.shape)
gx = jax.grad(lambda x: prob.obj.cost_at(3).stage_cost(x, prob.controls(3)))(
    prob.states(3))
assert np.allclose(exp.x[3], gx, atol=1e-10)   # AD oracle, like the notebook

# Error-state cost expansion (TO.error_expansion! on CostExpansion):
# Q~ = E^T Q E — the 3x3 rotation block is no longer diagonal.
Qerr = jnp.einsum("kil,kij,kjp->klp", E, exp.xx, E)
assert Qerr.shape == (N, nbar, nbar)
print("error-state cost Hessian block:", Qerr.shape)

# --- Constraints (notebook "Constraints" section) --------------------------
circle = cons.constraints[1]
assert to.sense(circle) is to.Inequality
p = circle.output_dim                       # length of the constraint vector
x3, u3 = prob.states(3), prob.controls(3)
v = circle.evaluate(x3, u3)                 # RD.evaluate(con, z)
jac = circle.jacobian(x3, u3)               # TO.jacobian! / gen_jacobian
assert jac.shape == (p, n)                  # StateConstraint width n
jac_ad = jax.jacfwd(circle.evaluate, argnums=0)(x3, u3)
assert np.allclose(jac, jac_ad, atol=1e-10)
print("circle constraint: p =", p, " jacobian", jac.shape)

# per-knot constraint counts (ConstraintList.p, constraint_list.jl:198-206)
print("num_constraints per knot:", prob.num_constraints()[:5], "...",
      prob.num_constraints()[-2:])

# --- Dynamics defects (the DynamicsConstraint analog) ----------------------
# Dynamics constraints for direct methods live in the NLP layer: defect
# residuals x_{k+1} - f(x_k, u_k) and their block Jacobians [A B | -I]
# (test/dynamics_constraints.jl:40-128 semantics).
nlp = to.TrajOptNLP(prob)
Z = nlp.initial_trajectory()
c = nlp.eval_c(Z)
defects = c[: (N - 1) * n].reshape(N - 1, n)
assert float(jnp.abs(defects).max()) < 1e-10   # rolled-out => feasible
print("defect residual max (rolled-out trajectory):",
      float(jnp.abs(defects).max()))

# --- The AL inner view (make_al_functions) ----------------------------------
# A custom solver gets the AL-augmented cost and its expansion as two pure
# functions closed over duals/penalties — what iLQR consumes.
from trajopt_tpu.solvers import SolverOptions
from trajopt_tpu.solvers.al import init_duals, make_al_functions
from trajopt_tpu.solvers.altro import _problem_blocks

blocks = _problem_blocks(prob)
lams, mus = init_duals(blocks, SolverOptions(), prob.xs.dtype)
cost_fn, expand_fn = make_al_functions(prob.obj, blocks, lams, mus)
print("AL cost at the rollout:", float(cost_fn(prob.xs, prob.us)))
al_exp = expand_fn(prob.xs, prob.us)
print("AL expansion blocks:", al_exp.xx.shape, al_exp.uu.shape)

print("internal API tour OK")
