"""Projected-Newton phase-2 robustness: the polish must never make the
answer worse (VERDICT r3 #7).

This is the second "phase 2 hurts" incident class (r2: SOC skipping; r3:
near-singular active-set normal equations on the 120-obstacle corridor
exploding the min-norm step, J 1.72 -> 340829).  The contract under test is
the keep-guard in projection.py: for every benchmark problem,
``projected_newton=True`` returns a (J, max_violation) pair no worse than
``projected_newton=False`` — violation never worsens beyond
max(AL violation, tolerance), and cost never blows up.

Reference anchor: /root/reference/docs/old/solvers.md (ALTRO composition —
projected newton is a *polish* phase).
"""
import jax.numpy as jnp
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.solvers import SolverOptions, solve_problem

# Reduced-N configs keep the A/B affordable on CPU; dubins_escape runs the
# full 120-obstacle corridor — the exact config that exposed the r3
# regression (many simultaneously-held circle rows near-singularize the
# active-set system).
CONFIGS = {
    "quickstart": (lambda: benchmarks.quickstart_problem(), SolverOptions()),
    "cartpole": (lambda: benchmarks.cartpole_swingup(N=51),
                 SolverOptions(cost_tolerance_intermediate=1e-2)),
    "dubins_parallel_park": (lambda: benchmarks.dubins_parallel_park(N=51),
                             SolverOptions(cost_tolerance_intermediate=1e-2)),
    "dubins_escape": (lambda: benchmarks.dubins_escape(),
                      SolverOptions(cost_tolerance_intermediate=1e-2)),
    "rocket": (lambda: benchmarks.rocket_landing(N=51), SolverOptions()),
    "quadrotor_zigzag": (lambda: benchmarks.quadrotor_zigzag(N=51),
                         SolverOptions(penalty_scaling=100.0,
                                       penalty_initial=0.1)),
}


_PN_ON_CACHE = {}


def _solve_pn_on(name):
    """Cached default (projected_newton=True) solve — shared between
    test_pn_never_worse and the fast-composition test so each config's
    baseline is solved once per session, not per test."""
    if name not in _PN_ON_CACHE:
        builder, opts = CONFIGS[name]
        _PN_ON_CACHE[name] = solve_problem(
            builder(), opts.replace(projected_newton=True))
    return _PN_ON_CACHE[name]


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_pn_never_worse(name):
    builder, opts = CONFIGS[name]
    prob = builder()
    sol_off = solve_problem(prob, opts.replace(projected_newton=False))
    sol_on = _solve_pn_on(name)
    tol = opts.constraint_tolerance
    viol_off = float(sol_off.max_violation)
    viol_on = float(sol_on.max_violation)
    J_off, J_on = float(sol_off.J), float(sol_on.J)
    # violation: PN may only hold or improve (up to tolerance-level slack)
    assert viol_on <= max(viol_off, tol) * (1 + 1e-9) + 1e-12
    # cost: no blow-up (the keep-guard's own bound, with test slack)
    assert J_on <= J_off + max(0.3 * abs(J_off), 1.5)
    # convergence must never be lost by adding the polish
    if bool(sol_off.converged):
        assert bool(sol_on.converged)


def test_al_phase_tolerance_composition():
    """Altro's historical projected_newton_tolerance semantics
    (opts.al_phase_tolerance): the AL phase exits at a loose violation and
    the PN phase closes to constraint_tolerance — tight feasibility at
    fewer AL iterations (the TPU cold bench's 2.7x lever).  Stopping the
    dual iteration early leaves the cost marginally suboptimal (measured
    ~0.13% here), so the J gate is the anchor-grade 0.5%."""
    builder, opts = CONFIGS["dubins_parallel_park"]
    tight = solve_problem(builder(), opts)
    loose = solve_problem(builder(), opts.replace(al_phase_tolerance=1e-3))
    assert bool(tight.converged) and bool(loose.converged)
    assert float(loose.max_violation) < opts.constraint_tolerance
    assert float(loose.J) == pytest.approx(float(tight.J), rel=5e-3)
    assert int(loose.iterations) < int(tight.iterations)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_fast_composition_never_loses_convergence(name):
    """VERDICT r4 #8: adopting the advertised fast composition
    (al_phase_tolerance=1e-1) must never LOSE convergence relative to the
    default.  When the loose AL exit hands PN a wrong active set (the
    documented Dubins-park failure), solve_problem's adaptive fallback
    re-enters the AL phase at the tight tolerance from the kept iterate."""
    builder, opts = CONFIGS[name]
    default = _solve_pn_on(name)
    fast = solve_problem(builder(), opts.replace(al_phase_tolerance=1e-1))
    if bool(default.converged):
        assert bool(fast.converged), (
            f"{name}: fast composition lost convergence "
            f"(viol {float(fast.max_violation):.3e})")
        assert float(fast.max_violation) < opts.constraint_tolerance
        # same basin class.  Stopping the dual iteration early leaves the
        # cost marginally suboptimal (options.py); measured 2026-08-21:
        # cartpole +3.3%, quickstart +1.0%, others <1% — gate at 5%.
        assert float(fast.J) == pytest.approx(float(default.J), rel=5e-2)
