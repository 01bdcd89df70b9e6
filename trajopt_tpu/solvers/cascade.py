"""Horizon-cascade (coarse-to-fine) warm starting.

Cold trajectory solves are ITERATION-count bound on TPU (CLAUDE.md: every
linearization alternative that cut per-iteration cost lost end-to-end
because weaker Jacobians inflate the iteration count).  The remaining lever
is to buy fine-grid iterations with cheap coarse-grid ones: solve the SAME
continuous problem on a coarse knot grid (Nc ~ N/4 -> ~4x cheaper per
iteration), linearly resample the converged trajectory AND the AL dual /
penalty state onto the fine grid, and warm-start the fine solve from there.

This is a capability the reference does not have (its solves are
single-problem, fixed-N — problem.jl has no regridding); it exists here
because batched cold-solve throughput is a first-class target
(BASELINE.md >= 1000 solves/s/chip).  Measured on v5e (B=2048 quadrotor,
N=101, bench.py BENCH_COLD_CASCADE=1): see PARITY.md perf table.

Design notes:
- Resampling is LINEAR in the knot index.  Duals of inequality blocks stay
  in the dual cone under linear interpolation (the orthant is convex);
  penalties interpolate positively.  Quaternion state rows must be
  renormalized after interpolation (`quat_slice`).
- The coarse solve uses a LOOSER constraint tolerance: it is a warm start,
  not an answer; its job is to place the iterate in the right basin with
  escalated penalties and near-converged duals.
- The fine solve is an ordinary warm-started `al_solve` continuation
  (trajectory + duals + penalties carry over) — the same machinery as MPC
  re-solves, so the cascade composes with batching/vmap unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .al import ALSolution, al_solve
from .options import SolverOptions

__all__ = ["resample_knots", "resample_solution", "cascade_solve"]


def resample_knots(arr: jax.Array, N_new: int, axis: int = 0) -> jax.Array:
    """Linear interpolation along a knot axis: length K -> N_new.

    Endpoint-preserving (positions are linspace(0, K-1, N_new)); works for
    any leaf shape, e.g. (K, n) trajectories, (K, p) dual blocks, (K,)
    penalty vectors."""
    arr = jnp.moveaxis(arr, axis, 0)
    K = arr.shape[0]
    pos = jnp.linspace(0.0, K - 1.0, N_new)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(K - 2, 0))
    w = (pos - i0).reshape((N_new,) + (1,) * (arr.ndim - 1)).astype(arr.dtype)
    out = arr[i0] * (1 - w) + arr[jnp.minimum(i0 + 1, K - 1)] * w
    return jnp.moveaxis(out, 0, axis)


def resample_solution(sol: ALSolution, N_new: int,
                      quat_slice: Optional[slice] = None) -> ALSolution:
    """Resample an (unbatched) ALSolution onto an ``N_new``-knot grid.

    Trajectory knots resample along axis 0; each dual/penalty block leaf
    resamples its own knot axis to ``N_new - 1``-proportional length —
    blocks keep their RELATIVE coverage (a block over all N-1 stage knots
    maps to the fine N-1; a single-knot block, e.g. a terminal goal,
    stays single-knot).  ``quat_slice`` marks state rows to renormalize
    after interpolation (quaternion components).  ``converged`` resets to
    False: the resampled iterate is a warm start, not a solution."""
    N_old = sol.xs.shape[0]

    def _n_new(k_old: int) -> int:
        if k_old == N_old:
            return N_new
        if k_old == N_old - 1:
            return N_new - 1
        return k_old  # partial-coverage block: keep its own knot count

    xs = resample_knots(sol.xs, N_new)
    if quat_slice is not None:
        q = xs[:, quat_slice]
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        xs = jnp.concatenate(
            [xs[:, :quat_slice.start], q, xs[:, quat_slice.stop:]], axis=-1)
    us = resample_knots(sol.us, N_new)
    duals = tuple(resample_knots(lam, _n_new(lam.shape[0]))
                  for lam in sol.duals)
    pens = tuple(resample_knots(mu, _n_new(mu.shape[0]))
                 for mu in sol.penalties)
    return sol.replace(xs=xs, us=us, duals=duals, penalties=pens,
                       converged=jnp.zeros_like(sol.converged))


def cascade_solve(
    make_stage: Callable[[int], tuple],
    Ns: Sequence[int],
    opts: SolverOptions,
    x0: jax.Array,
    us0: jax.Array,
    coarse_tolerance_scale: float = 4.0,
    quat_slice: Optional[slice] = None,
) -> ALSolution:
    """Coarse-to-fine AL solve over the horizon schedule ``Ns``.

    ``make_stage(N) -> (model, obj, blocks, times, dts)`` builds the SAME
    problem discretized at N knots (cost weights must be per-knot
    consistent — e.g. `LQRObjective` at each N).  ``us0`` is the (Ns[0], m)
    initial control guess for the coarsest stage.  All stages but the last
    run at ``coarse_tolerance_scale * constraint_tolerance``.

    Host-driven composition of jittable stages (each stage is one compiled
    `al_solve`); vmap/batch by vmapping each stage call site — bench.py's
    BENCH_COLD_CASCADE path is the batched production form of this loop.
    """
    sol = None
    us = us0
    for i, N in enumerate(Ns):
        model, obj, blocks, times, dts = make_stage(N)
        o = opts if i == len(Ns) - 1 else opts.replace(
            constraint_tolerance=opts.constraint_tolerance
            * coarse_tolerance_scale)
        if sol is None:
            sol = al_solve(model, obj, blocks, x0, us, times, dts, o)
        else:
            seed = resample_solution(sol, N, quat_slice=quat_slice)
            sol = al_solve(model, obj, blocks, x0, seed.us, times, dts, o,
                           xs_init=seed.xs, duals_init=seed.duals,
                           penalties_init=seed.penalties)
    return sol
