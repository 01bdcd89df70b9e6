"""Solver-independent quality anchors for the BASELINE configs
(VERDICT r3 #2).

Self-recorded goldens (test_golden.py) catch regressions but cannot say a
trajectory is *right*.  The reference anchors its solver against Ipopt
(test/moi_test.jl:21-27: cost agreement between ALTRO and a direct NLP
solve); Ipopt/Julia are unavailable here, so the independent solver is
``nlp.solve_nlp`` — scipy SLSQP over the flattened direct NLP, a completely
different algorithm (dense SQP, no Riccati, no augmented Lagrangian) sharing
only the problem definition.  Matching-N cost agreement <= 0.5% between the
two is the quality contract.

Dubins parallel-park and cartpole carry external Ipopt bounds already
(test_solve.py, test_hard_configs.py); this file anchors the remaining
BASELINE configs: the flagship quadrotor zig-zag and the rocket SOCP.
Reduced N keeps the dense SLSQP tractable; the config geometry (waypoints,
cones, bounds) is the full one.
"""
import jax
import numpy as np
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.nlp import solve_nlp
from trajopt_tpu.solvers import SolverOptions, solve_problem


def _anchor(prob_altro, prob_nlp, opts, nlp_kwargs, warm=False):
    sol = solve_problem(prob_altro, opts)
    assert bool(sol.converged)
    prob_nlp.rollout()
    if warm:
        from trajopt_tpu.nlp import TrajOptNLP
        nlp_kwargs = dict(nlp_kwargs,
                          Z0=TrajOptNLP(prob_nlp).pack(sol.xs, sol.us))
    xs, us, info = solve_nlp(prob_nlp, **nlp_kwargs)
    assert info["success"], info["message"]
    assert info["max_violation"] < 1e-6
    J_altro = float(prob_nlp.obj.cost(sol.xs, sol.us))
    assert abs(info["cost"] - J_altro) / abs(J_altro) < 5e-3
    return sol, info


def test_quadrotor_zigzag_anchor():
    """Flagship config: SLSQP KKT certificate at matching N — the BASELINE
    north-star parity config's first solver-independent quality anchor.

    The zig-zag landscape has several nearby local basins (J = 5.755, ~5.80,
    ~6.1-6.3 at N=101, CLAUDE.md), so a cold independent solve can
    legitimately land in a different basin (and SLSQP needs >400 dense-QP
    iterations to converge from hover at N=31).  The meaningful
    solver-independent check is a CERTIFICATE: SLSQP started AT the ALTRO
    solution must declare optimality at tight feasibility without
    descending away (> 0.5% cost drop would expose a suboptimal iterate;
    a KKT failure would expose a wrong one)."""
    opts = SolverOptions(penalty_scaling=100.0, penalty_initial=0.1)
    _anchor(benchmarks.quadrotor_zigzag(N=31),
            benchmarks.quadrotor_zigzag(N=31), opts,
            dict(max_iter=400), warm=True)


def test_rocket_anchor():
    """Rocket soft-landing SOCP: ALTRO (conic AL + SOC-aware PN) vs SLSQP
    with scalarized cone rows at matching N."""
    _anchor(benchmarks.rocket_landing(N=31),
            benchmarks.rocket_landing(N=31), SolverOptions(),
            dict(max_iter=400))
