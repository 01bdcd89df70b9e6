"""Solver robustness gates (VERDICT r2 #1).

The flagship quadrotor config sat on a numerical knife edge: a 1e-12
perturbation of x0 flipped the solve between J=5.75/converged and
J=32582/viol=238 (the first inner iLQR descended the weakly-penalized AL
merit into a huge-control basin and wedged; penalties then saturated on the
garbage iterate).  The AL divergence safeguard (solvers/al.py: outer-iterate
rejection + best-iterate restore + forced escalation) plus the
projected-Newton phase-2 rescue (solvers/altro.altro_solve) must make the
default-options solve converge for ANY small perturbation of the nominal
initial state — the reference's convergence contract
(/root/reference/docs/old/solver_interface.md; Altro solves RigidBody
models in the tangent space per abstract_constraint.jl:282-303).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.models.quadrotor import Quadrotor
from trajopt_tpu.parallel.batch import batch_solve
from trajopt_tpu.solvers import SolverOptions
from trajopt_tpu.solvers.altro import _problem_blocks

B = 20


@pytest.mark.parametrize("structured", [True, False],
                         ids=["errstate_block", "dense_errstate"])
def test_quadrotor_x0_perturbation_robust(structured, monkeypatch):
    """quadrotor_zigzag converges under default opts for 20 random x0
    perturbations spanning 1e-9..1e-6, with the structured AND the dense
    error-state path (the two are algebraically identical; neither may sit
    on a basin knife edge)."""
    if not structured:
        monkeypatch.setattr(Quadrotor, "errstate_block", None)
    prob = benchmarks.quadrotor_zigzag()
    blocks = _problem_blocks(prob)
    scales = 10.0 ** jnp.linspace(-9, -6, B)
    noise = jax.random.normal(jax.random.PRNGKey(0), (B, prob.n))
    x0s = prob.x0[None] + scales[:, None] * noise
    us0 = jnp.tile(prob.us[None], (B, 1, 1))
    opts = SolverOptions(penalty_scaling=100.0, penalty_initial=0.1,
                         record_stats=False)
    sol = batch_solve(prob.model, prob.obj, blocks, x0s, us0, prob.times,
                      prob.dts, opts)
    conv = np.asarray(sol.converged)
    viol = np.asarray(sol.max_violation)
    J = np.asarray(sol.J)
    assert conv.all(), (
        f"unconverged scenarios {np.flatnonzero(~conv)}: "
        f"viol={viol[~conv]}, J={J[~conv]}")
    assert viol.max() < 1e-6
    # every scenario must land in the good basin (J ~ 5.75), never the
    # huge-control one (J ~ 3e4) or the untouched initial rollout (8e4)
    assert J.max() < 7.0, f"J range [{J.min():.4g}, {J.max():.4g}]"
