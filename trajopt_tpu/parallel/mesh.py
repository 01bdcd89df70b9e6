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


def _pad_rows(tree, pad: int):
    """Pad every leaf's leading (scenario) axis by repeating the last row.

    Non-divisible batches are padded up to the mesh multiple; padded lanes
    solve a duplicate scenario (wasted compute, correct results) and are
    masked out of the reduced stats.
    """
    if pad == 0:
        return tree
    return jax.tree.map(
        lambda a: jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0),
        tree)


def _unpad_rows(tree, B: int):
    return jax.tree.map(lambda a: a[:B], tree)


def _put(a, sharding: NamedSharding):
    """device_put that also works when the sharding spans processes.

    Multi-host (jax.distributed) meshes include non-addressable devices;
    there each process supplies its addressable shards of the host array
    via make_array_from_callback (every process holds the full host batch —
    the SPMD single-controller convention).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def _masked_stats(sol: "ALSolution", valid: jax.Array) -> BatchStats:
    """BatchStats over valid (non-padding) lanes only."""
    nv = jnp.sum(valid.astype(jnp.int32))
    denom = jnp.maximum(nv, 1).astype(jnp.float32)
    return BatchStats(
        num_converged=jnp.sum((sol.converged & valid).astype(jnp.int32)),
        num_scenarios=nv,
        mean_iterations=jnp.sum(
            jnp.where(valid, sol.iterations.astype(jnp.float32), 0.0)) / denom,
        # violations are >= 0, so 0 is a safe masked identity for max
        max_violation=jnp.max(jnp.where(valid, sol.max_violation, 0.0)),
        total_cost=jnp.sum(jnp.where(valid, sol.J, 0.0)),
    )


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

    def _solve_batch(obj_, x0s, us0, valid):
        sol = jax.vmap(lambda x0, us: al_solve(model, obj_, blocks, x0, us,
                                               times, dts, opts))(x0s, us0)
        return sol, _masked_stats(sol, valid)

    jitted = jax.jit(
        _solve_batch,
        in_shardings=(replicated, shard_b, shard_b, shard_b),
        out_shardings=(shard_b, replicated),
    )

    def solve(x0s: jax.Array, us0: jax.Array,
              obj_override: Optional[Objective] = None):
        B = x0s.shape[0]
        n_dev = mesh.devices.size
        pad = (-B) % n_dev
        x0s, us0 = _pad_rows((x0s, us0), pad)
        valid = np.arange(B + pad) < B
        x0s = _put(x0s, shard_b)
        us0 = _put(us0, shard_b)
        valid = _put(valid, shard_b)
        sol, stats = jitted(
            obj_override if obj_override is not None else obj, x0s, us0, valid)
        return _unpad_rows(sol, B), stats

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

    def _pad_args(x_meas, prev, obj_):
        """Pad scenario tensors up to the mesh multiple and commit them to
        the scenario sharding (slices of a previously-unpadded solution
        carry a stale sharding and must be re-laid-out)."""
        B = x_meas.shape[0]
        pad = (-B) % mesh.devices.size
        x_meas, prev = jax.tree.map(
            lambda a: _put(a, shard_b), _pad_rows((x_meas, prev), pad))
        if batch_objective:
            obj_ = jax.tree.map(lambda a: _put(a, shard_b),
                                _pad_rows(obj_, pad))
        valid = _put(np.arange(B + pad) < B, shard_b)
        return x_meas, prev, obj_, valid, B

    if lin_window > 0:
        def _step(obj_, x, prev, lin):
            return mpc_step(model, obj_, blocks, x, prev, times, dts, opts,
                            schedule=tuple(schedule), relin_every=relin_every,
                            lin=lin, lin_window=lin_window)

        vmapped = jax.vmap(_step,
                           in_axes=(obj_axis, 0, 0, (0, 0, None)),
                           out_axes=(0, (0, 0, None)))

        def _batch(obj_, x, prev, lin, valid):
            sol, lin_n = vmapped(obj_, x, prev, lin)
            return sol, lin_n, _masked_stats(sol, valid)

        jitted = jax.jit(
            _batch,
            in_shardings=(obj_sharding, shard_b, shard_b,
                          (shard_b, shard_b, replicated), shard_b),
            out_shardings=(shard_b, (shard_b, shard_b, replicated),
                           replicated),
        )

        def controller(x_meas, prev, lin, obj_override=None):
            obj_ = obj_override if obj_override is not None else obj
            x_meas, prev, obj_, valid, B = _pad_args(x_meas, prev, obj_)
            pad = valid.shape[0] - B
            lin = (_put(_pad_rows(lin[0], pad), shard_b),
                   _put(_pad_rows(lin[1], pad), shard_b),
                   _put(lin[2], replicated))
            sol, lin_n, stats = jitted(obj_, x_meas, prev, lin, valid)
            sol = _unpad_rows(sol, B)
            lin_n = (_unpad_rows(lin_n[0], B), _unpad_rows(lin_n[1], B),
                     lin_n[2])
            return sol, lin_n, stats

        return controller

    def _step(obj_, x, prev):
        return mpc_step(model, obj_, blocks, x, prev, times, dts, opts,
                        schedule=tuple(schedule), relin_every=relin_every)

    vmapped = jax.vmap(_step, in_axes=(obj_axis, 0, 0))

    def _batch(obj_, x, prev, valid):
        sol = vmapped(obj_, x, prev)
        return sol, _masked_stats(sol, valid)

    jitted = jax.jit(
        _batch,
        in_shardings=(obj_sharding, shard_b, shard_b, shard_b),
        out_shardings=(shard_b, replicated),
    )

    def controller(x_meas, prev, obj_override=None):
        obj_ = obj_override if obj_override is not None else obj
        x_meas, prev, obj_, valid, B = _pad_args(x_meas, prev, obj_)
        sol, stats = jitted(obj_, x_meas, prev, valid)
        return _unpad_rows(sol, B), stats

    return controller
