"""Recompilation regression tests — the TPU analog of the reference's
zero-allocation perf contract (test/cost_tests.jl:1-28 `@ballocated == 0`,
gated in runtests.jl:17; SURVEY.md §4: "Build analog: no recompilation in
the solve loop, zero host transfers per iteration").

On TPU a silent retrace is the equivalent of a hot-loop allocation: the
MPC fleet once regressed 14x because a stats=SolveStats cold solution fed
a stats=None fixed-schedule step and forced a retrace inside the timed
loop (CLAUDE.md / bench.py record_stats note).  These tests pin that down:
the jitted controller must compile exactly once across warm-started steps,
and the cold-solve output pytree must be structure-identical to the step
output so it can seed the loop without retracing.
"""
import jax
import jax.numpy as jnp
import numpy as np

import trajopt_tpu as to
from trajopt_tpu import mpc
from trajopt_tpu.models import DoubleIntegrator
from trajopt_tpu.solvers import ConstraintBlock, SolverOptions
from trajopt_tpu.solvers.al import al_solve


def _setup(N=15, tf=2.0):
    model = DoubleIntegrator(d=2)
    n, m = 4, 2
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), jnp.ones(m), 10 * jnp.ones(n), xf, N)
    blocks = (
        ConstraintBlock(con=to.BoundConstraint.create(n, m, u_min=-10, u_max=10),
                        inds=tuple(range(N - 1))),
    )
    dm = to.discretize(model, "rk4")
    times = jnp.linspace(0, tf, N)
    dts = jnp.full(N, tf / (N - 1)).at[-1].set(0.0)
    return dm, obj, blocks, times, dts, n, m, N


def test_mpc_controller_compiles_once():
    """The bench-critical invariant: N warm-started MPC steps with fresh
    measured states and evolving solution pytrees hit ONE executable."""
    dm, obj, blocks, times, dts, n, m, N = _setup()
    opts = SolverOptions(record_stats=False, final_polish=False,
                         iterations=6, iterations_outer=2, iterations_inner=5,
                         iterations_linesearch=2, jacobian_mode="approx")
    B = 4
    x0s = jnp.zeros((B, n)).at[:, 0].set(jnp.linspace(-0.5, 0.5, B))
    us0 = jnp.zeros((B, N, m))
    cold = jax.jit(jax.vmap(
        lambda a, b: al_solve(dm, obj, blocks, a, b, times, dts, opts)))
    sol = jax.block_until_ready(cold(x0s, us0))

    controller = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                         batched=True, schedule=(1,))
    for step in range(5):
        x_meas = sol.xs[:, 1, :] + 1e-3 * step  # fresh concrete data each step
        sol = jax.block_until_ready(controller(x_meas, sol))
    assert controller._cache_size() == 1, (
        f"MPC controller retraced: {controller._cache_size()} compilations "
        "for identical-structure inputs")


def test_cold_solution_pytree_matches_step_output():
    """record_stats=False cold solves and fixed-schedule MPC steps must
    produce structurally identical ALSolution pytrees (the 14x bench
    regression: a structure mismatch here forces a retrace per step)."""
    dm, obj, blocks, times, dts, n, m, N = _setup()
    opts = SolverOptions(record_stats=False, final_polish=False)
    x0 = jnp.zeros(n)
    us0 = jnp.zeros((N, m))
    cold = al_solve(dm, obj, blocks, x0, us0, times, dts, opts)
    step = mpc.mpc_step(dm, obj, blocks, x0, cold, times, dts, opts,
                        schedule=(1,))
    t_cold = jax.tree_util.tree_structure(cold)
    t_step = jax.tree_util.tree_structure(step)
    assert t_cold == t_step, (
        f"ALSolution structure drift between cold solve and MPC step:\n"
        f"cold: {t_cold}\nstep: {t_step}")
    # dtypes/shapes must match too (a weak-type or f32/f64 flip also retraces)
    for a, b in zip(jax.tree_util.tree_leaves(cold),
                    jax.tree_util.tree_leaves(step)):
        assert jnp.asarray(a).shape == jnp.asarray(b).shape
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype


def test_solve_no_host_transfers_per_iteration():
    """The AL/iLQR loop body must be free of host syncs: a jitted solve
    returns without materializing intermediates (jit tracing would fail on
    a concretization; this also documents the contract)."""
    dm, obj, blocks, times, dts, n, m, N = _setup()
    opts = SolverOptions(record_stats=False)
    solve = jax.jit(lambda a, b: al_solve(dm, obj, blocks, a, b, times, dts,
                                          opts))
    # First call commits closure constants to device (one-time, amortized).
    jax.block_until_ready(solve(jnp.zeros(n), jnp.zeros((N, m))))
    # Steady state: a fresh solve must not move anything host<->device
    # beyond its two device-resident arguments.
    x0 = jax.device_put(jnp.full(n, 0.1))
    us = jax.device_put(jnp.zeros((N, m)))
    with jax.transfer_guard("disallow"):
        sol = solve(x0, us)
        jax.block_until_ready(sol)
    assert bool(sol.converged)
