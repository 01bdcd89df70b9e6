"""Batched and sharded solve tests — the multi-scenario/multi-device layer
the reference lacks (SURVEY.md §4 'Multi-node testing: none exists')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import DoubleIntegrator
from trajopt_tpu.parallel import (
    batch_solve, make_mesh, make_sharded_solver,
)
from trajopt_tpu.solvers import ALTROSolver, ConstraintBlock, SolverOptions
from trajopt_tpu import mpc


def _setup(N=15, tf=2.0):
    model = DoubleIntegrator(d=2)
    n, m = 4, 2
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), jnp.ones(m), 10 * jnp.ones(n), xf, N)
    blocks = (
        ConstraintBlock(con=to.GoalConstraint.create(xf, m=m), inds=(N - 1,)),
        ConstraintBlock(con=to.BoundConstraint.create(n, m, u_min=-10, u_max=10),
                        inds=tuple(range(N - 1))),
    )
    dm = to.discretize(model, "rk4")
    times = jnp.linspace(0, tf, N)
    dts = jnp.full(N, tf / (N - 1)).at[-1].set(0.0)
    return dm, obj, blocks, times, dts, n, m, N, xf


def test_batch_matches_single(rng):
    """vmapped batch solve == per-scenario solves (single-chip vs batched
    equivalence, SURVEY.md §4).  batch_solve routes through altro_solve
    (AL + projected-Newton phase 2), so the single-scenario reference must
    too — like-for-like (VERDICT r3 #4)."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions()
    B = 3
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.5)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    assert sol.xs.shape == (B, N, n)
    assert bool(jnp.all(sol.converged))
    from trajopt_tpu.solvers.altro import altro_solve
    for b in range(B):
        single = altro_solve(dm, obj, blocks, x0s[b], us0[b], times, dts,
                             opts)
        assert np.allclose(single.us, sol.us[b], atol=1e-8)
        assert float(single.J) == pytest.approx(float(sol.J[b]), rel=1e-8)


def test_sharded_solve_on_mesh(rng):
    """8-virtual-device CPU mesh: sharded scenario axis + psum'd stats."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    solve = make_sharded_solver(mesh, dm, obj, blocks, times, dts, opts)
    B = 16
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.5)
    us0 = jnp.zeros((B, N, m))
    sol, stats = solve(x0s, us0)
    assert int(stats.num_converged) == B
    assert int(stats.num_scenarios) == B
    assert float(stats.max_violation) < opts.constraint_tolerance
    # sharded result equals unsharded batch result
    ref = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    assert np.allclose(np.asarray(sol.us), np.asarray(ref.us), atol=1e-8)
    # batch not divisible by mesh (VERDICT r4 #9): padded + masked, same
    # results on the valid lanes, padded lanes excluded from stats
    sol3, stats3 = solve(x0s[:3], us0[:3])
    assert sol3.xs.shape[0] == 3
    assert int(stats3.num_scenarios) == 3
    assert int(stats3.num_converged) == 3
    # masked-stats contract: total_cost sums exactly the valid lanes' J
    assert float(stats3.total_cost) == pytest.approx(
        float(jnp.sum(sol3.J)), rel=1e-12)
    assert np.allclose(np.asarray(sol3.us), np.asarray(ref.us[:3]), atol=1e-8)


def test_mpc_warm_start(rng):
    """Receding-horizon step: warm-started re-solve from a perturbed state
    converges in fewer iterations than a cold solve."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions()
    from trajopt_tpu.solvers.al import al_solve
    x0 = jnp.zeros(n)
    cold = al_solve(dm, obj, blocks, x0, jnp.zeros((N, m)), times, dts, opts)
    assert bool(cold.converged)
    x_meas = cold.xs[1] + 0.01 * jnp.asarray(rng.standard_normal(n))
    controller = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts)
    warm = controller(x_meas, cold)
    assert bool(warm.converged)
    assert int(warm.iterations) <= int(cold.iterations)


def test_fixed_schedule_mpc_fleet(rng):
    """Fixed-schedule (real-time iteration) MPC fleet: deterministic budget,
    warm duals+penalties, batched."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions()
    B = 4
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.3)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    assert bool(jnp.all(sol.converged))
    controller = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                         batched=True, schedule=(2, 1, 1))
    x_meas = sol.xs[:, 1] + 0.01 * jnp.asarray(rng.standard_normal((B, n)))
    warm = controller(x_meas, sol)
    assert warm.us.shape == (B, N, m)
    assert int(warm.iterations[0]) == 4  # static budget
    assert float(jnp.max(warm.max_violation)) < 1e-4


def test_lin_carry_mpc_fleet(rng):
    """Cross-step Jacobian carry (shift + rotating refresh window) tracks
    the relinearize-every-step controller (exactly, for the constant-
    Jacobian double integrator) and the fleet keeps contracting."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions(record_stats=False)
    B = 4
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.3)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    ctrl_full = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                        batched=True, schedule=(1,),
                                        relin_every=1)
    ctrl_carry = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                         batched=True, schedule=(1,),
                                         lin_window=7)  # 7 | N-1 = 14
    lin = mpc.init_lin_carry(dm, sol, times, dts, opts, batched=True)
    assert lin[0].shape == (B, N - 1, n, n)
    sol_f, sol_c = sol, sol
    viols = []
    for _ in range(6):
        sol_f = ctrl_full(sol_f.xs[:, 1], sol_f)
        sol_c, lin = ctrl_carry(sol_c.xs[:, 1], sol_c, lin)
        viols.append(float(jnp.max(sol_c.max_violation)))
    assert lin[2].ndim == 0  # fleet-shared refresh pointer (no scatter)
    assert int(lin[2]) == (6 * 7) % (N - 1)  # pointer rotated
    # 1-GN-iteration-per-step budget: the fleet contracts monotonically
    assert viols[-1] < viols[0]
    assert np.allclose(np.asarray(sol_c.us), np.asarray(sol_f.us), atol=1e-8)
    # lin_window without a fixed schedule is an error
    with pytest.raises(ValueError):
        mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                batched=True, lin_window=7)


def test_refresh_linearization_mechanics(rng):
    """Shift + rotating-window refresh bookkeeping on a NONLINEAR model
    (state-dependent Jacobians): refreshed rows equal the exact
    linearization at their knots, untouched rows equal the shifted carry."""
    from trajopt_tpu.models import DubinsCar
    from trajopt_tpu.solvers.fixed import refresh_linearization
    from trajopt_tpu.solvers.ilqr import _linearize, _linearize_knots

    N = 15
    model = DubinsCar()
    n, m = 3, 2
    dm = to.discretize(model, "rk4")
    times = jnp.linspace(0, 2.0, N)
    dts = jnp.full(N, 2.0 / (N - 1)).at[-1].set(0.0)
    opts = SolverOptions()
    xs = jnp.asarray(rng.standard_normal((N, n)))
    us = jnp.asarray(rng.standard_normal((N, m)))
    A0, B0 = _linearize(dm, xs, us, times, dts, opts)
    # shift one knot (what mpc_step does alongside shift_trajectory)
    A_s, B_s, ptr = mpc.shift_linearization((A0, B0, jnp.zeros((), jnp.int32)))
    assert np.allclose(A_s[:-1], A0[1:]) and np.allclose(A_s[-1], A0[-1])
    w, p = 5, 4
    (A_r, B_r), ptr_n = refresh_linearization(
        dm, (A_s, B_s), xs[:-1], us[:-1], times[:-1], dts[:-1], opts,
        jnp.asarray(p, jnp.int32), w)
    assert int(ptr_n) == (p + w) % (N - 1)
    A_w, B_w = _linearize_knots(dm, xs[p:p + w], us[p:p + w],
                                times[p:p + w], dts[p:p + w], opts)
    assert np.allclose(A_r[p:p + w], A_w) and np.allclose(B_r[p:p + w], B_w)
    mask = np.ones(N - 1, bool)
    mask[p:p + w] = False
    assert np.allclose(A_r[mask], A_s[mask])
    assert np.allclose(B_r[mask], B_s[mask])


def test_unconditional_full_step_mpc(rng):
    """iterations_linesearch=0 (RTI mode): unconditional alpha=1 step with
    no acceptance test — the fleet still contracts under a 1-iteration
    schedule, and the to-tolerance solver rejects the option."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions(record_stats=False)
    opts0 = SolverOptions(record_stats=False, iterations_linesearch=0)
    B = 4
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.3)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    ctrl = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts0,
                                   batched=True, schedule=(1,))
    sol_c = sol
    viols = []
    for _ in range(5):
        sol_c = ctrl(sol_c.xs[:, 1], sol_c)
        viols.append(float(jnp.max(sol_c.max_violation)))
    assert np.all(np.isfinite(np.asarray(sol_c.us)))
    assert viols[-1] < viols[0]  # contracting
    # warm-started RTI steps accept alpha=1: the unconditional step equals
    # the accept-tested single-alpha step exactly
    ctrl1 = mpc.make_mpc_controller(
        dm, obj, blocks, times, dts,
        SolverOptions(record_stats=False, iterations_linesearch=1),
        batched=True, schedule=(1,))
    sol_1 = sol
    for _ in range(5):
        sol_1 = ctrl1(sol_1.xs[:, 1], sol_1)
    assert np.allclose(np.asarray(sol_c.us), np.asarray(sol_1.us), atol=1e-10)
    # to-tolerance path refuses the option
    from trajopt_tpu.solvers.al import al_solve
    with pytest.raises(ValueError):
        al_solve(dm, obj, blocks, x0s[0], us0[0], times, dts, opts0)


def test_sharded_mpc_controller_matches_unsharded(rng):
    """The PRODUCTION MPC path on the 8-device mesh (VERDICT r1 #7): the
    fixed-schedule RTI controller with Jacobian carry and a per-scenario
    objective produces the SAME trajectories sharded as unsharded, and the
    psum'd BatchStats agree with host reductions."""
    from trajopt_tpu.parallel import make_sharded_mpc_controller

    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions(record_stats=False, iterations_linesearch=1,
                         final_polish=False, jacobian_mode="approx1")
    mesh = make_mesh()
    B = 8
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.3)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts,
                      SolverOptions(record_stats=False))

    # per-scenario objectives: each controller tracks a shifted goal
    objs = [to.LQRObjective(jnp.ones(n), jnp.ones(m), 10 * jnp.ones(n),
                            xf + 0.05 * i, N) for i in range(B)]
    obj_b = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *objs)

    ctrl = make_sharded_mpc_controller(
        mesh, dm, obj, blocks, times, dts, opts, schedule=(1,),
        lin_window=2, batch_objective=True)
    A0, B0 = mpc.init_lin_carry(dm, sol, times, dts, opts, batched=True)[:2]
    lin = (A0, B0, jnp.zeros((), jnp.int32))

    sol_s, lin_s = sol, lin
    for _ in range(3):
        sol_s, lin_s, stats = ctrl(sol_s.xs[:, 1], sol_s, lin_s,
                                   obj_override=obj_b)

    # unsharded reference: same vmapped step on one device
    from trajopt_tpu.mpc import mpc_step

    def step(o, x, prev, lin):
        return mpc_step(dm, o, blocks, x, prev, times, dts, opts,
                        schedule=(1,), lin=lin, lin_window=2)

    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, (0, 0, None)),
                             out_axes=(0, (0, 0, None))))
    sol_u, lin_u = sol, lin
    for _ in range(3):
        sol_u, lin_u = vstep(obj_b, sol_u.xs[:, 1], sol_u, lin_u)

    assert np.allclose(np.asarray(sol_s.us), np.asarray(sol_u.us), atol=1e-8)
    assert np.allclose(np.asarray(sol_s.xs), np.asarray(sol_u.xs), atol=1e-8)
    assert int(lin_s[2]) == int(lin_u[2])
    # psum'd stats == host reductions
    assert int(stats.num_scenarios) == B
    assert int(stats.num_converged) == int(sol_s.converged.sum())
    assert float(stats.max_violation) == pytest.approx(
        float(sol_s.max_violation.max()), abs=1e-12)

    # non-divisible fleet (B=5 on 8 devices, VERDICT r4 #9): pad + mask
    B5 = 5
    obj_b5 = jax.tree_util.tree_map(lambda a: a[:B5], obj_b)
    lin5 = (A0[:B5], B0[:B5], jnp.zeros((), jnp.int32))
    sol5 = jax.tree_util.tree_map(lambda a: a[:B5], sol)
    for _ in range(3):
        sol5, lin5, stats5 = ctrl(sol5.xs[:, 1], sol5, lin5,
                                  obj_override=obj_b5)
    assert sol5.us.shape[0] == B5
    assert int(stats5.num_scenarios) == B5
    assert np.allclose(np.asarray(sol5.us), np.asarray(sol_u.us[:B5]),
                       atol=1e-8)
