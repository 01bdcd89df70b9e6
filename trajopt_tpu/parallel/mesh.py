"""Multi-device / multi-host sharded solves.

The reference has zero parallelism (SURVEY.md §2.3); this is the build's
scaling layer: a 1-D device mesh with the SCENARIO axis sharded across
ICI/DCN.  Per-scenario solves are independent, so the only collective
traffic is the convergence-flag / throughput reduction (``psum``), exactly
as laid out in SURVEY.md §5 'Distributed communication backend'.

Usage:
    mesh = make_mesh()                      # all local devices
    solve = make_sharded_solver(mesh, ...)  # jit w/ NamedSharding
    sol, stats = solve(x0s, us0)            # x0s sharded over 'scenarios'

For multi-host, call ``jax.distributed.initialize()`` first; the same mesh
construction spans hosts and the scenario shards ride ICI within a slice and
DCN across slices.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics import DiscreteModel
from ..objective import Objective
from ..solvers.al import ALSolution, ConstraintBlock, al_solve
from ..solvers.options import SolverOptions

__all__ = ["make_mesh", "make_sharded_solver", "make_sharded_mpc_controller",
           "BatchStats"]

SCENARIO_AXIS = "scenarios"


class BatchStats(NamedTuple):
    """Globally-reduced solve statistics (the psum'd metrics)."""

    num_converged: jax.Array
    num_scenarios: jax.Array
    mean_iterations: jax.Array
    max_violation: jax.Array
    total_cost: jax.Array


def make_mesh(n_devices: Optional[int] = None, axis: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over the scenario axis (jax.make_mesh analog)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_sharded_solver(
    mesh: Mesh,
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
):
    """Build a jitted sharded batch solver.

    Scenario tensors (x0s, us0, and the whole solution pytree) are sharded
    over the mesh's scenario axis via NamedSharding; XLA partitions the
    vmapped solve with no per-step collectives (scenarios are independent)
    and inserts the final psum only for the scalar stats reduction.
    """
    blocks = tuple(blocks)
    # Host literals for closure data (utils/host.py): closed-over device
    # arrays degrade dispatch latency on tunneled backends.
    from ..utils.host import to_host
    model, blocks, times, dts = to_host((model, blocks, times, dts))
    axis = mesh.axis_names[0]
    shard_b = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def _solve_batch(obj_, x0s, us0):
        sol = jax.vmap(lambda x0, us: al_solve(model, obj_, blocks, x0, us,
                                               times, dts, opts))(x0s, us0)
        stats = BatchStats(
            num_converged=jnp.sum(sol.converged.astype(jnp.int32)),
            num_scenarios=jnp.asarray(x0s.shape[0], jnp.int32),
            mean_iterations=jnp.mean(sol.iterations.astype(jnp.float32)),
            max_violation=jnp.max(sol.max_violation),
            total_cost=jnp.sum(sol.J),
        )
        return sol, stats

    jitted = jax.jit(
        _solve_batch,
        in_shardings=(replicated, shard_b, shard_b),
        out_shardings=(shard_b, replicated),
    )

    def solve(x0s: jax.Array, us0: jax.Array,
              obj_override: Optional[Objective] = None):
        B = x0s.shape[0]
        n_dev = mesh.devices.size
        if B % n_dev != 0:
            raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")
        x0s = jax.device_put(x0s, shard_b)
        us0 = jax.device_put(us0, shard_b)
        return jitted(obj_override if obj_override is not None else obj, x0s, us0)

    return solve


def make_sharded_mpc_controller(
    mesh: Mesh,
    model: DiscreteModel,
    obj: Objective,
    blocks: Sequence[ConstraintBlock],
    times: jax.Array,
    dts: jax.Array,
    opts: SolverOptions,
    schedule=(1,),
    relin_every: int = 2,
    lin_window: int = 0,
    batch_objective: bool = False,
):
    """The PRODUCTION receding-horizon step, sharded over the scenario axis:
    fixed-schedule real-time-iteration re-solve (mpc.mpc_step) with optional
    cross-step Jacobian carry and an optional PER-SCENARIO objective
    (tracking fleets where every controller chases its own reference).

    Returns ``controller(x_meas, prev_sol[, lin][, obj_override]) ->
    (sol[, lin], BatchStats)``.  All scenario tensors (measured states, the
    solution pytree, carried Jacobians) are sharded over the mesh's
    scenario axis; the rotating-refresh pointer and the psum'd BatchStats
    are replicated.  Scenarios are independent, so the only collective is
    the stats reduction — the comm layer of SURVEY.md §2.3.
    """
    from ..mpc import mpc_step

    blocks = tuple(blocks)
    from ..utils.host import to_host
    model, blocks, times, dts = to_host((model, blocks, times, dts))
    axis = mesh.axis_names[0]
    shard_b = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    obj_axis = 0 if batch_objective else None
    obj_sharding = shard_b if batch_objective else replicated

    def _stats(sol: ALSolution) -> BatchStats:
        return BatchStats(
            num_converged=jnp.sum(sol.converged.astype(jnp.int32)),
            num_scenarios=jnp.asarray(sol.xs.shape[0], jnp.int32),
            mean_iterations=jnp.mean(sol.iterations.astype(jnp.float32)),
            max_violation=jnp.max(sol.max_violation),
            total_cost=jnp.sum(sol.J),
        )

    if lin_window > 0:
        def _step(obj_, x, prev, lin):
            return mpc_step(model, obj_, blocks, x, prev, times, dts, opts,
                            schedule=tuple(schedule), relin_every=relin_every,
                            lin=lin, lin_window=lin_window)

        vmapped = jax.vmap(_step,
                           in_axes=(obj_axis, 0, 0, (0, 0, None)),
                           out_axes=(0, (0, 0, None)))

        def _batch(obj_, x, prev, lin):
            sol, lin_n = vmapped(obj_, x, prev, lin)
            return sol, lin_n, _stats(sol)

        jitted = jax.jit(
            _batch,
            in_shardings=(obj_sharding, shard_b, shard_b,
                          (shard_b, shard_b, replicated)),
            out_shardings=(shard_b, (shard_b, shard_b, replicated),
                           replicated),
        )

        def controller(x_meas, prev, lin, obj_override=None):
            return jitted(obj_override if obj_override is not None else obj,
                          x_meas, prev, lin)

        return controller

    def _step(obj_, x, prev):
        return mpc_step(model, obj_, blocks, x, prev, times, dts, opts,
                        schedule=tuple(schedule), relin_every=relin_every)

    vmapped = jax.vmap(_step, in_axes=(obj_axis, 0, 0))

    def _batch(obj_, x, prev):
        sol = vmapped(obj_, x, prev)
        return sol, _stats(sol)

    jitted = jax.jit(
        _batch,
        in_shardings=(obj_sharding, shard_b, shard_b),
        out_shardings=(shard_b, replicated),
    )

    def controller(x_meas, prev, obj_override=None):
        return jitted(obj_override if obj_override is not None else obj,
                      x_meas, prev)

    return controller
