"""Direct collocation (DIRCOL) solver — Hermite-Simpson transcription
(docs/old/solvers.md DIRCOLSolver; defect math: compressed HS collocation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import DoubleIntegrator, DubinsCar
from trajopt_tpu.nlp import TrajOptNLP, num_vars
from trajopt_tpu.solvers import ALTROSolver, DIRCOLOptions, DIRCOLSolver, SolverOptions


def _block_move(N=21, tf=2.0, bound=None):
    model = DoubleIntegrator(d=1)
    n, m = model.n, model.m
    xf = jnp.array([1.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), 0.1 * jnp.ones(m), 100.0 * jnp.ones(n),
                          xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    if bound is not None:
        cons.add_constraint(
            to.BoundConstraint.create(n, m, u_min=-bound, u_max=bound),
            range(N - 1))
    return to.Problem(model, obj, jnp.zeros(n), tf=tf, xf=xf,
                      constraints=cons)


def test_hs_layout_and_packing():
    prob = _block_move()
    nlp = TrajOptNLP(prob, defect="hermite_simpson")
    n, m, N = prob.n, prob.m, prob.N
    # terminal knot carries a control variable (uN layout)
    assert nlp.NN == num_vars(n, m, N, uN=True) == N * (n + m)
    xs = jnp.arange(N * n, dtype=jnp.float64).reshape(N, n)
    us = jnp.arange(N * m, dtype=jnp.float64).reshape(N, m)
    Z = nlp.pack(xs, us)
    xs2, us2 = nlp.unpack(Z)
    np.testing.assert_allclose(xs2, xs)
    np.testing.assert_allclose(us2, us)
    assert nlp.data.uinds(N - 1).size == m  # exists under uN


def test_hs_defect_exact_on_cubic():
    # Double integrator with linear-in-time control: x(t) is cubic, so
    # Simpson quadrature and the Hermite interpolant are EXACT — the HS
    # defect of the analytic trajectory is zero to machine precision.
    prob = _block_move(N=9, tf=2.0)
    nlp = TrajOptNLP(prob, defect="hermite_simpson")
    t = np.asarray(prob.times, dtype=np.float64)
    us = (2.0 + 3.0 * t)[:, None]  # u(t) = 2 + 3t, FOH-exact (linear)
    # x(t) = [p(t), v(t)] with v' = u -> v = 2t + 1.5t^2, p = t^2 + 0.5t^3
    xs = np.stack([t**2 + 0.5 * t**3, 2.0 * t + 1.5 * t**2], axis=1)
    c = np.asarray(nlp._defects(jnp.asarray(xs), jnp.asarray(us)))
    assert np.max(np.abs(c)) < 1e-12


def test_hs_jacobian_matches_ad_oracle():
    prob = _block_move(N=7)
    nlp = TrajOptNLP(prob, defect="hermite_simpson")
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.normal(size=nlp.NN))
    J_blocks = nlp.jac_c_dense(Z)
    J_ad = np.asarray(jax.jacfwd(nlp._eval_c_impl)(Z))
    np.testing.assert_allclose(J_blocks, J_ad, atol=1e-9)
    # gradient oracle too (terminal-u layout has a zero cost-gradient row)
    g = np.asarray(nlp.grad_f(Z))
    g_ad = np.asarray(jax.grad(nlp._eval_f_impl)(Z))
    np.testing.assert_allclose(g, g_ad, atol=1e-9)


def test_dircol_solver_interface_and_cross_check():
    prob = _block_move(bound=1.5)
    solver = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=300))
    with pytest.raises(RuntimeError):
        solver.cost()
    xs, us = solver.solve()
    assert solver.converged()
    assert solver.max_violation() < 1e-6
    assert solver.controls().shape == (prob.N, prob.m)  # terminal u kept
    # cross-check against ALTRO on the same problem.  The transcriptions
    # differ (RK4 + zero-order-hold controls vs Hermite-Simpson +
    # first-order-hold), so the discrete optima agree only to a few percent
    # at N=21 (moi_test.jl-style solver cross-check, not an identity).
    altro = ALTROSolver(_block_move(bound=1.5),
                        SolverOptions(constraint_tolerance=1e-8))
    altro.solve()
    assert solver.cost() == pytest.approx(float(altro.cost()), rel=8e-2)
    np.testing.assert_allclose(np.asarray(xs[-1]), [1.0, 0.0], atol=1e-6)


def test_dircol_dubins_parallel_park():
    # quality anchor config (test/moi_test.jl uses Ipopt on this problem);
    # a coarse N keeps the host SQP quick while still exercising the
    # nonlinear-dynamics collocation path.
    from trajopt_tpu.benchmarks import dubins_parallel_park

    prob = dubins_parallel_park(N=21)
    prob.rollout()
    solver = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=400))
    solver.solve()
    assert solver.max_violation() < 1e-6
    assert solver.converged()


def test_dircol_quadrotor_cold_anchor():
    """VERDICT r4 #4: a cold INDEPENDENT solve (DIRCOL: Hermite-Simpson
    collocation, FOH controls, dense host SQP, own rollout initialization)
    pointed at the flagship config at reduced N.  Measured 2026-08-21
    (N=31): DIRCOL J=0.023495, ALTRO J=0.023747 — +1.07% gap across the
    transcriptions (RK4+ZOH vs HS+FOH) and the zig-zag's flat valley; the
    gate allows 5%.  A materially suboptimal or wrong ALTRO basin (the
    nearby basins differ by >8%) fails this."""
    from trajopt_tpu.benchmarks import quadrotor_zigzag
    from trajopt_tpu.solvers import SolverOptions

    opts = SolverOptions(penalty_scaling=100.0, penalty_initial=0.1)
    altro = ALTROSolver(quadrotor_zigzag(N=31), opts)
    altro.solve()
    assert bool(altro.solution.converged)
    prob = quadrotor_zigzag(N=31)
    prob.rollout()
    d = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=500))
    d.solve()
    assert d.converged() and d.max_violation() < 1e-6
    gap = (altro.cost() - d.cost()) / d.cost()
    assert abs(gap) < 5e-2, f"ALTRO vs DIRCOL gap {gap:+.3%}"


def test_dircol_rocket_cold_anchor():
    """Rocket SOCP cold DIRCOL anchor (VERDICT r4 #4).  The FOH/ZOH
    transcription gap is LARGE here (measured +27.9% at N=31, dt=0.33:
    linearly-interpolated thrust is genuinely cheaper on this config), so
    the meaningful gates are (a) DIRCOL converges tightly, (b) the FOH
    relaxation is never more expensive than ALTRO's ZOH optimum, (c) the
    gap stays inside the measured window.  ALTRO's own transcription
    optimality is certified exactly by test_anchors.py::test_rocket_anchor
    (cold SLSQP on the same RK4+ZOH discretization matches to 4 decimals)."""
    from trajopt_tpu.benchmarks import rocket_landing
    from trajopt_tpu.solvers import SolverOptions

    altro = ALTROSolver(rocket_landing(N=31), SolverOptions())
    altro.solve()
    assert bool(altro.solution.converged)
    prob = rocket_landing(N=31)
    prob.rollout()
    d = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=500))
    d.solve()
    assert d.converged() and d.max_violation() < 1e-6
    assert d.cost() <= altro.cost() * (1 + 1e-6)  # FOH relaxation is cheaper
    gap = (altro.cost() - d.cost()) / d.cost()
    assert gap < 0.40, f"gap {gap:+.3%} beyond the measured FOH/ZOH window"


def test_warm_start_defect_guard():
    """r5 regression: a dynamically-INCONSISTENT warm-start state
    trajectory (e.g. a DIRCOL solution under ALTRO's RK4 stepping) is
    constraint-feasible and artificially cheap; pre-guard it came back as
    converged=True with J 22% below the true transcription optimum.  The
    contract now: a finite guess may SEED the iterate (the state-guess
    seeding that threads dubins_escape), but (a) the solve can never
    report CONVERGED while sitting on an inconsistent guess, and (b) the
    returned trajectory always satisfies the step equation (the exit
    swaps to the best consistent iterate when seeding fails to move)."""
    from trajopt_tpu.benchmarks import rocket_landing
    from trajopt_tpu.solvers import SolverOptions

    prob = rocket_landing(N=31)
    prob.rollout()
    d = DIRCOLSolver(prob, DIRCOLOptions(max_iterations=500))
    xs_d, us_d = d.solve()
    p2 = rocket_landing(N=31)
    p2.initial_controls(us_d[:-1])
    p2.initial_states(xs_d)  # NOT an RK4 rollout: defect ~ O(1)
    w = ALTROSolver(p2, SolverOptions())
    w.solve()
    xs_w, us_w = w.solution.xs, w.solution.us
    pred = jax.vmap(p2.model.step)(xs_w[:-1], us_w[:-1],
                                   p2.times[:-1], p2.dts[:-1])
    defect = float(jnp.max(jnp.abs(pred - xs_w[1:])))
    assert defect < 1e-8, f"returned trajectory defect {defect:.2e}"
    # the artificially-cheap guess cost must not be reported: either the
    # solve moved to a genuine optimum, or it is honestly unconverged
    if bool(w.solution.converged):
        assert w.cost() > d.cost() * 1.05
