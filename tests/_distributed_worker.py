"""Worker for the 2-process jax.distributed test (run as a subprocess).

Usage: python _distributed_worker.py <coordinator_port> <process_id> <num_procs>

Each process owns 4 virtual CPU devices; the 1-D scenario mesh spans all
8 global devices, so the scenario shards cross the process (DCN-analog)
boundary — the multi-host path of SURVEY.md §2.3 that single-process
virtual-device tests cannot exercise.  VERDICT r4 #5.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nprocs

    import trajopt_tpu as to
    from trajopt_tpu.models import DoubleIntegrator
    from trajopt_tpu.parallel import batch_solve, make_mesh, make_sharded_solver
    from trajopt_tpu.solvers import ConstraintBlock, SolverOptions

    # Same config as tests/test_batch.py::_setup — small and fast.
    N, tf = 15, 2.0
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
    opts = SolverOptions()

    # Every process holds the SAME full host batch (single-controller SPMD
    # convention); the sharded solver scatters it over the global mesh.
    rng = np.random.default_rng(1)
    B = 8
    x0s = jnp.asarray(rng.standard_normal((B, n)) * 0.5)
    us0 = jnp.zeros((B, N, m))

    mesh = make_mesh()  # all 8 global devices
    assert mesh.devices.size == 4 * nprocs
    solve = make_sharded_solver(mesh, dm, obj, blocks, times, dts, opts)
    sol, stats = solve(x0s, us0)

    # Replicated stats are addressable on every process: the psum crossed
    # the process boundary.
    assert int(stats.num_scenarios) == B
    assert int(stats.num_converged) == B, int(stats.num_converged)
    assert float(stats.max_violation) < opts.constraint_tolerance

    # Local shards must equal the corresponding rows of a single-process
    # reference solve (tolerance equality across the process boundary).
    # Like-for-like: the sharded solver wraps al_solve, so the reference
    # must too (batch_solve routes through altro_solve's PN phase).
    from trajopt_tpu.solvers.al import al_solve
    ref = jax.jit(jax.vmap(
        lambda a, b: al_solve(dm, obj, blocks, a, b, times, dts, opts)))(
        x0s, us0)
    ref_us = np.asarray(ref.us)
    ref_J = np.asarray(ref.J)
    checked = 0
    for shard in sol.us.addressable_shards:
        rows = shard.index[0]
        assert np.allclose(np.asarray(shard.data), ref_us[rows], atol=1e-8)
        checked += shard.data.shape[0]
    for shard in sol.J.addressable_shards:
        assert np.allclose(np.asarray(shard.data), ref_J[shard.index[0]],
                           rtol=1e-10)
    assert checked == B // nprocs, checked

    print(f"OK process {pid}: checked {checked} local scenarios")


if __name__ == "__main__":
    main()
