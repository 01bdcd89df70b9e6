"""End-to-end solver tests on the BASELINE benchmark configs (SURVEY.md §6):
quickstart block-move, cartpole swing-up, dubins parallel-park (with the
reference's recorded Ipopt optimum as the quality gate), rocket SOCP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import Cartpole, DoubleIntegrator, DubinsCar, Rocket
from trajopt_tpu.models.rocket import thrust_cone_constraint
from trajopt_tpu.solvers import ALTROSolver, SolverOptions, iLQRSolver


def test_ilqr_lqr_one_step(rng):
    """On an LQR problem (linear dynamics, quadratic cost) iLQR converges in
    one iteration — the Riccati pass IS the exact solution."""
    model = DoubleIntegrator(d=2)
    N = 11
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(4), jnp.ones(2), 10 * jnp.ones(4), xf, N)
    prob = to.Problem(model, obj, jnp.zeros(4), 2.0, xf=xf)
    solver = iLQRSolver(prob)
    sol = solver.solve()
    assert bool(sol.converged)
    assert int(sol.iterations) <= 3
    assert float(sol.gradient) < 1e-6


def test_quickstart_solve(rng):
    """The minimum end-to-end slice (SURVEY.md §7): LQR + goal + circle
    obstacle + SOC control norm + control bounds."""
    model = DoubleIntegrator(d=2)
    n, m, N, tf = 4, 2, 21, 3.0
    x0 = jnp.zeros(4)
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), jnp.ones(m), jnp.ones(n) * (N - 1), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    cons.add_constraint(to.CircleConstraint.create(n, [0.0], [1.0], [0.5], m=m),
                        range(1, N - 1))
    cons.add_constraint(to.NormConstraint.create(n, m, 5.0, to.SecondOrderCone,
                                                 "control"), range(N - 1))
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-10, u_max=10),
                        range(N - 1))
    prob = to.Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    # break the left/right symmetry of the obstacle
    prob.initial_controls(0.01 * jax.random.normal(jax.random.PRNGKey(1), (N - 1, m)))
    solver = ALTROSolver(prob)
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    assert float(jnp.max(jnp.abs(sol.xs[-1] - xf))) < 1e-6
    assert float(jnp.max(jnp.linalg.norm(sol.us[:-1], axis=-1))) < 5.0 + 1e-6
    d = jnp.sqrt(sol.xs[1:N-1, 0] ** 2 + (sol.xs[1:N-1, 1] - 1.0) ** 2)
    assert float(jnp.min(d)) > 0.5 - 1e-6


def test_cartpole_swingup():
    """Cartpole swing-up benchmark (examples/Cartpole.ipynb config)."""
    model = Cartpole()
    n, m, N, tf = 4, 1, 101, 5.0
    xf = jnp.array([0.0, jnp.pi, 0.0, 0.0])
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-1 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-3.0, u_max=3.0),
                        range(N - 1))
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    prob = to.Problem(model, obj, jnp.zeros(4), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.01))
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    assert abs(float(sol.xs[-1, 1]) - np.pi) < 1e-6
    assert float(jnp.max(jnp.abs(sol.us[:-1]))) <= 3.0 + 1e-6


def test_dubins_parallel_park_matches_reference_optimum():
    """DubinsCar parallel park (test/test_models.jl:105-143).  The reference
    records the Ipopt optimum in v0.5 dt-scaled cost semantics:
    cost < 0.0541, max_violation < 1e-11 (test/moi_test.jl:22-27).  Our
    unscaled cost times dt must land under the same bound."""
    model = DubinsCar()
    n, m, N, tf = 3, 2, 101, 3.0
    xf = jnp.array([0.0, 1.5, 0.0])
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-2 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-2.0, u_max=2.0),
                        range(N - 1))
    cons.add_constraint(
        to.BoundConstraint.create(n, m, x_min=[-0.25, -0.001, -np.inf],
                                  x_max=[0.25, 1.501, np.inf]), range(1, N - 1))
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    prob = to.Problem(model, obj, jnp.zeros(3), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.1))
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    dt = tf / (N - 1)
    assert solver.cost() * dt < 0.0541  # moi_test.jl:22
    assert float(jnp.linalg.norm(sol.xs[-1] - xf)) < 1e-6  # moi_test.jl:26


def test_rocket_socp():
    """Rocket soft landing with SOC thrust constraints (BASELINE config 4)."""
    model = Rocket(mass=10.0)
    n, m, N, tf = 6, 3, 51, 8.0
    x0 = jnp.array([4.0, 2.0, 20.0, -3.0, 2.0, -5.0])
    xf = jnp.zeros(6)
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-1 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    cons.add_constraint(to.NormConstraint.create(n, m, 3 * 10.0 * 9.81,
                                                 to.SecondOrderCone, "control"),
                        range(N - 1))
    cons.add_constraint(thrust_cone_constraint(n, m, np.pi / 4), range(N - 1))
    prob = to.Problem(model, obj, x0, tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.tile(jnp.array([0.0, 0.0, 98.1]), (N - 1, 1)))
    solver = ALTROSolver(prob)
    sol = solver.solve()
    assert bool(sol.converged)
    # SOC-aware projected-Newton polish (on by default) reaches direct-
    # solver feasibility grades on SOCPs — the moi_test.jl:22-27 1e-11
    # class — not just AL tolerance (VERDICT r2 #7)
    assert solver.max_violation() < 1e-8
    assert float(jnp.max(jnp.abs(sol.xs[-1]))) < 1e-6
    u = sol.us[:-1]
    assert float(jnp.max(jnp.linalg.norm(u, axis=-1))) <= 3 * 98.1 + 1e-5
    assert bool(jnp.all(jnp.linalg.norm(u[:, :2], axis=-1)
                        <= np.tan(np.pi / 4) * u[:, 2] + 1e-6))


def test_projected_newton_polish():
    """ALTRO phase 2: projected-Newton polish reaches the reference's
    direct-solver feasibility grade (max_violation < 1e-11, moi_test.jl:23)."""
    model = DubinsCar()
    n, m, N, tf = 3, 2, 101, 3.0
    xf = jnp.array([0.0, 1.5, 0.0])
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-2 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-2.0, u_max=2.0),
                        range(N - 1))
    cons.add_constraint(
        to.BoundConstraint.create(n, m, x_min=[-0.25, -0.001, -np.inf],
                                  x_max=[0.25, 1.501, np.inf]), range(1, N - 1))
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    prob = to.Problem(model, obj, jnp.zeros(3), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.1))
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2,
                                             projected_newton=True))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-11
    assert solver.cost() * tf / (N - 1) < 0.0541


def test_infeasible_start():
    """ALTRO slack-augmented infeasible start (docs/old/solver_interface.md):
    solve from a dynamically-inconsistent state guess; the slacks reproduce
    the guess exactly and the AL drives them to zero."""
    from trajopt_tpu.solvers import ConstraintBlock
    from trajopt_tpu.solvers.infeasible import solve_infeasible

    model = DoubleIntegrator(d=2)
    dm = to.discretize(model, "rk4")
    n, m, N, tf = 4, 2, 21, 3.0
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), jnp.ones(m), 20 * jnp.ones(n), xf, N)
    blocks = (ConstraintBlock(con=to.GoalConstraint.create(xf, m=m),
                              inds=(N - 1,)),)
    times = jnp.linspace(0, tf, N)
    dts = jnp.full(N, tf / (N - 1)).at[-1].set(0.0)
    X0 = jnp.linspace(jnp.zeros(n), xf, N)  # dynamically inconsistent
    sol = solve_infeasible(dm, obj, blocks, jnp.zeros(n), X0,
                           jnp.zeros((N, m)), times, dts, SolverOptions())
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    assert float(jnp.max(jnp.abs(sol.xs[-1] - xf))) < 1e-6


def _parallel_park_problem():
    model = DubinsCar()
    n, m, N, tf = 3, 2, 101, 3.0
    xf = jnp.array([0.0, 1.5, 0.0])
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-2 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-2.0, u_max=2.0),
                        range(N - 1))
    cons.add_constraint(
        to.BoundConstraint.create(n, m, x_min=[-0.25, -0.001, -np.inf],
                                  x_max=[0.25, 1.501, np.inf]), range(1, N - 1))
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    prob = to.Problem(model, obj, jnp.zeros(3), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.1))
    return prob, tf, N


def test_augmented_lagrangian_solver():
    """AugmentedLagrangianSolver (docs/old/solvers.md:18): AL-iLQR without
    the ALTRO extras still solves the parallel park, and forces the
    infeasible/projected-newton options off even if set."""
    from trajopt_tpu.solvers import AugmentedLagrangianSolver

    prob, tf, N = _parallel_park_problem()
    solver = AugmentedLagrangianSolver(
        prob, SolverOptions(cost_tolerance_intermediate=1e-2,
                            projected_newton=True, infeasible=True))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    assert solver.cost() * tf / (N - 1) < 0.0541


def test_projected_newton_solver_standalone():
    """ProjectedNewtonSolver (docs/old/solvers.md:37): polish an
    externally-produced trajectory to direct-solver feasibility."""
    from trajopt_tpu.solvers import AugmentedLagrangianSolver, \
        ProjectedNewtonSolver

    prob, tf, N = _parallel_park_problem()
    al = AugmentedLagrangianSolver(
        prob, SolverOptions(cost_tolerance_intermediate=1e-2))
    sol = al.solve()
    assert 1e-11 < al.max_violation() < 1e-6  # AL grade, not yet PN grade
    prob.initial_trajectory(sol.xs, sol.us)
    pn = ProjectedNewtonSolver(prob, SolverOptions())
    polished = pn.solve()
    assert pn.max_violation() < 1e-11  # moi_test.jl:23 feasibility grade
    assert bool(polished.converged)


def test_exact_al_hessian_matches_ad():
    """al_hessian_exact=True must produce the TRUE Hessian of the AL merit:
    per-knot expansion blocks == diagonal blocks of jax.hessian(cost_fn),
    wiring cones.projection_hessian + constraints.constraint_hessian into a
    solver-facing path (VERDICT r1 #5).  Exercises all three cone senses:
    equality (goal), inequality (circle), SOC (norm)."""
    from trajopt_tpu.benchmarks import quickstart_problem
    from trajopt_tpu.solvers.al import init_duals, make_al_functions
    from trajopt_tpu.solvers.altro import _problem_blocks

    prob = quickstart_problem(N=7)
    prob.rollout()
    blocks = _problem_blocks(prob)
    opts = SolverOptions(penalty_initial=1.3)
    lams, mus = init_duals(blocks, opts, jnp.float64)
    # nonzero duals so the dPi point is generic
    rng = np.random.default_rng(5)
    lams = tuple(jnp.asarray(0.1 * rng.standard_normal(l.shape)) for l in lams)

    cost_fn, expand_fn = make_al_functions(prob.obj, blocks, lams, mus,
                                           exact_hessian=True)
    # push the trajectory into ACTIVE constraint territory: controls beyond
    # the SOC limit (curved projection region) and states into the obstacle
    # (violated inequality rows) so the dropped-by-GN curvature is nonzero
    xs = prob.xs + 0.01 * rng.standard_normal(prob.xs.shape)
    xs = xs.at[2:5, 0].set(0.1).at[2:5, 1].set(1.0)
    us = prob.us + 4.0 + 0.1 * rng.standard_normal(prob.us.shape)
    exp = expand_fn(xs, us)

    Hxx = jax.hessian(lambda x: cost_fn(x, us))(xs)     # (N, n, N, n)
    Huu = jax.hessian(lambda u: cost_fn(xs, u))(us)
    Hux = jax.jacfwd(jax.grad(lambda x, u: cost_fn(x, u), argnums=1),
                     argnums=0)(xs, us)                 # (N, m, N, n)
    N = prob.N
    for k in range(N):
        assert np.allclose(exp.xx[k], Hxx[k, :, k, :], atol=1e-9), k
        assert np.allclose(exp.uu[k], Huu[k, :, k, :], atol=1e-9), k
        assert np.allclose(exp.ux[k], Hux[k, :, k, :], atol=1e-9), k

    # the GN default must NOT match exactly on this nonlinear-SOC problem
    _, expand_gn = make_al_functions(prob.obj, blocks, lams, mus)
    exp_gn = expand_gn(xs, us)
    assert not all(
        np.allclose(exp_gn.xx[k], Hxx[k, :, k, :], atol=1e-9)
        for k in range(N))


def test_exact_al_hessian_solve():
    """The full-Newton AL mode solves the SOC rocket problem end-to-end."""
    from trajopt_tpu.benchmarks import rocket_landing

    prob = rocket_landing(N=31)
    sol = ALTROSolver(prob, SolverOptions(al_hessian_exact=True)).solve()
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6


def test_projected_newton_scales_n401():
    """Block-tridiagonal PN at N=401 Dubins: compiles in seconds (three O(N)
    scans, no unrolled dense assembly) and polishes to tight feasibility
    (VERDICT r1 #6)."""
    import time
    from trajopt_tpu.benchmarks import dubins_parallel_park
    from trajopt_tpu.solvers import solve_problem

    t0 = time.time()
    sol = solve_problem(dubins_parallel_park(N=401),
                        SolverOptions(projected_newton=True,
                                      projected_newton_iterations=8,
                                      constraint_tolerance=1e-6))
    elapsed = time.time() - t0
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-11
    assert elapsed < 120.0, f"PN N=401 took {elapsed:.1f}s"
