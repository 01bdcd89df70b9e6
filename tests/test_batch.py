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
    equivalence, SURVEY.md §4)."""
    dm, obj, blocks, times, dts, n, m, N, xf = _setup()
    opts = SolverOptions()
    B = 3
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.5)
    us0 = jnp.zeros((B, N, m))
    sol = batch_solve(dm, obj, blocks, x0s, us0, times, dts, opts)
    assert sol.xs.shape == (B, N, n)
    assert bool(jnp.all(sol.converged))
    from trajopt_tpu.solvers.al import al_solve
    for b in range(B):
        single = al_solve(dm, obj, blocks, x0s[b], us0[b], times, dts, opts)
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
    # batch not divisible by mesh -> error
    with pytest.raises(ValueError):
        solve(x0s[:3], us0[:3])


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
