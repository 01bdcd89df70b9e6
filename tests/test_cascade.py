"""Horizon-cascade (coarse-to-fine) warm starting (solvers/cascade.py).

The capability behind bench.py's BENCH_COLD_CASCADE cold-solve path: solve
on a coarse knot grid, resample trajectory + AL dual/penalty state to the
fine grid, warm-start the fine solve.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import DubinsCar
from trajopt_tpu.solvers import (ConstraintBlock, SolverOptions, al_solve,
                                 cascade_solve, resample_knots,
                                 resample_solution)


def test_resample_knots_endpoints_and_linearity():
    arr = jnp.asarray(np.arange(10.0)[:, None] * np.array([1.0, -2.0]))
    out = resample_knots(arr, 19)
    # endpoint-preserving
    assert np.allclose(out[0], arr[0]) and np.allclose(out[-1], arr[-1])
    # linear data resamples exactly
    assert np.allclose(out[:, 0], np.linspace(0, 9, 19), atol=1e-12)
    assert np.allclose(out[:, 1], -2 * np.linspace(0, 9, 19), atol=1e-12)
    # axis argument
    out2 = resample_knots(arr.T, 19, axis=1)
    assert np.allclose(out2, out.T, atol=1e-12)
    # downsample hits the coarse subsamples of the original grid
    down = resample_knots(arr, 4)
    assert np.allclose(down[:, 0], [0.0, 3.0, 6.0, 9.0], atol=1e-12)


def _stage_builder(tf=3.0):
    model = DubinsCar()
    n, m = 3, 2
    xf = jnp.array([0.0, 1.5, 0.0])

    def make_stage(N):
        obj = to.LQRObjective(0.01 * jnp.ones(n), 0.01 * jnp.ones(m),
                              100.0 * jnp.ones(n), xf, N)
        blocks = (
            ConstraintBlock(con=to.GoalConstraint.create(xf, m=m),
                            inds=(N - 1,)),
            ConstraintBlock(
                con=to.BoundConstraint.create(n, m, u_min=-2.0, u_max=2.0),
                inds=tuple(range(N - 1))),
        )
        dm = to.discretize(model, "rk4")
        times = jnp.linspace(0, tf, N)
        dts = jnp.full(N, tf / (N - 1)).at[-1].set(0.0)
        return dm, obj, blocks, times, dts

    return make_stage, n, m


def test_resample_solution_block_coverage():
    """Dual blocks keep their relative knot coverage: an all-stage-knots
    block resamples to the fine N-1; a single-knot (terminal goal) block
    stays single-knot."""
    make_stage, n, m = _stage_builder()
    N0 = 11
    dm, obj, blocks, times, dts = make_stage(N0)
    us0 = jnp.full((N0, m), 0.1)  # nudge off the zero-control ridge
    sol = al_solve(dm, obj, blocks, jnp.zeros(n), us0,
                   times, dts, SolverOptions())
    assert bool(sol.converged)
    fine = resample_solution(sol, 21)
    assert fine.xs.shape == (21, n) and fine.us.shape == (21, m)
    assert fine.duals[0].shape[0] == 1          # goal block: 1 knot
    assert fine.duals[1].shape[0] == 20         # bound block: N-1 knots
    assert fine.penalties[1].shape[0] == 20
    assert not bool(fine.converged)
    # inequality duals stay in the dual cone under linear interpolation
    assert float(fine.duals[1].min()) >= 0.0


def test_cascade_solve_matches_direct():
    """Coarse->fine cascade converges to the direct fine solve's optimum
    and spends FEWER fine-grid iterations."""
    make_stage, n, m = _stage_builder()
    opts = SolverOptions(cost_tolerance_intermediate=1e-2)
    N = 41
    x0 = jnp.zeros(n)
    sol_direct = al_solve(*make_stage(N)[:3], x0, jnp.full((N, m), 0.1),
                          *make_stage(N)[3:], opts)
    sol_casc = cascade_solve(make_stage, [11, N], opts, x0,
                             jnp.full((11, m), 0.1))
    assert bool(sol_direct.converged) and bool(sol_casc.converged)
    assert float(sol_casc.max_violation) < opts.constraint_tolerance
    # Nonconvex problem: basins may differ (measured: the cascade lands in
    # a ~4% CHEAPER basin here).  The contract is feasible-and-no-worse.
    J_d, J_c = float(sol_direct.J), float(sol_casc.J)
    assert J_c <= J_d * (1 + 1e-3)
    # the fine stage of the cascade needs fewer iterations than a cold
    # fine solve (the entire point)
    assert int(sol_casc.iterations) < int(sol_direct.iterations)
