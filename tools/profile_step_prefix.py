"""Cumulative-prefix profile of the fixed-schedule RTI MPC step.

Isolated component timings mislead under XLA fusion (materializing
intermediates that the full step fuses away).  This tool times jitted
PREFIXES of the exact al_solve_fixed(schedule=(1,)) composition — P1,
P1+P2, P1+P2+P3, ... — each reduced to a scalar so the output write
cost is constant, and reports the MARGINAL cost of each phase.

Run alone on the TPU (never concurrent with another TPU process).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build, log  # noqa: E402


def tsum(tree):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating))


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))  # compile
    eps = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
        jnp.asarray(args[0]).dtype)
    t0 = time.time()
    for _ in range(reps):
        out = fn(jnp.asarray(args[0]) + eps, *args[1:])
        eps = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
            jnp.asarray(args[0]).dtype)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1e3
    return dt


def main():
    from trajopt_tpu import mpc
    from trajopt_tpu.solvers import SolverOptions
    from trajopt_tpu.solvers.al import (
        al_solve, eval_blocks, init_duals, make_al_functions,
        max_violation_blocks, update_duals, update_penalties,
    )
    from trajopt_tpu.solvers.fixed import refresh_linearization
    from trajopt_tpu.solvers.ilqr import _backward_pass, _forward_pass

    dtype = jnp.float32
    B, N, tf = int(os.environ.get("BENCH_B", 2048)), 101, 5.0
    linwin = int(os.environ.get("BENCH_LINWIN", 20))
    opts_kw = dict(
        penalty_scaling=100.0, penalty_initial=0.1,
        constraint_tolerance=5e-4, cost_tolerance=1e-3,
        cost_tolerance_intermediate=1e-2, gradient_tolerance=1e-4,
        gradient_tolerance_intermediate=1e-3, bp_reg_initial=1e-6,
        iterations=6, iterations_outer=2, iterations_inner=5,
        iterations_linesearch=int(os.environ.get("BENCH_LS", 2)),
        line_search_min_alpha=1e-4,
        final_polish=False,
        jacobian_mode=os.environ.get("BENCH_JM", "approx1"),
        record_stats=False,
    )
    dm, obj, blocks, x0, times, dts, opts, n, m, hover = build(
        B, N, tf, dtype, opts_kw)

    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + 0.05 * jax.random.normal(key, (B, n), dtype)
    us0 = jnp.full((B, N, m), hover, dtype)
    log(f"prefix profile: B={B} N={N} linwin={linwin} "
        f"device={jax.devices()[0]}")

    cold_opts = dict(opts_kw)
    cold_opts.update(iterations=120, iterations_outer=8, iterations_inner=40,
                     iterations_linesearch=16)
    opts_cold = SolverOptions(**cold_opts)
    cold = jax.jit(jax.vmap(
        lambda a, b: al_solve(dm, obj, blocks, a, b, times, dts, opts_cold)))
    sol = jax.block_until_ready(cold(x0s, us0))
    log(f"cold: converged {int(sol.converged.sum())}/{B}, "
        f"max viol {float(sol.max_violation.max()):.2e}")
    lin = mpc.init_lin_carry(dm, sol, times, dts, opts, batched=True)
    x_meas = sol.xs[:, 1, :]

    # The exact step phases (mpc_step -> al_solve_fixed, schedule=(1,),
    # lin carry, no shift), cut after each phase.
    def phases(x, prev, A_c, B_c, ptr, upto):
        xs, us = mpc.shift_trajectory(prev.xs, prev.us)
        lams = mpc.shift_duals(blocks, prev.duals)
        mus = mpc.shift_duals(blocks, prev.penalties)
        if upto == 0:
            return tsum((xs, us, lams, mus))
        AB, ptr2 = refresh_linearization(
            dm, (A_c, B_c), xs[:-1], us[:-1], times[:-1], dts[:-1],
            opts, ptr, linwin)
        if upto == 1:
            return tsum(AB)
        cost_fn, expand_fn = make_al_functions(obj, blocks, lams, mus)
        J = cost_fn(xs, us)
        if upto == 2:
            return tsum((AB, J))
        rho = jnp.asarray(opts.bp_reg_initial, dtype)
        bp = _backward_pass(dm, expand_fn, xs, us, times, dts, rho,
                            jnp.ones((), dtype), opts, AB=AB)
        if upto == 3:
            return tsum((bp.K, bp.d, bp.dV1, bp.dV2))
        xs_n, us_n, J_n, lsf = _forward_pass(
            dm, cost_fn, xs, us, bp.K, bp.d, bp.dV1, bp.dV2, J, x, times,
            dts, opts)
        xs = jnp.where(bp.fail, xs, xs_n)
        us = jnp.where(bp.fail, us, us_n)
        if upto == 4:
            return tsum((xs, us, J_n))
        cvals = eval_blocks(blocks, xs, us)
        viol = max_violation_blocks(blocks, cvals)
        lams = update_duals(blocks, lams, mus, cvals, opts)
        mus2 = jax.tree_util.tree_map(
            lambda new, old: jnp.where(viol < opts.constraint_tolerance,
                                       old, new),
            update_penalties(mus, opts), mus)
        if upto == 5:
            return tsum((lams, mus2, viol))
        return tsum((obj.cost(xs, us), lams, mus2, viol, xs, us))

    names = ["warm-start shifts", "lin refresh", "AL cost J0",
             "backward pass", "forward pass", "constr+dual+pen update",
             "final objective"]
    prev_dt = 0.0
    for upto in range(7):
        fn = jax.jit(jax.vmap(
            lambda x, p, A_, B_, pt, u=upto: phases(x, p, A_, B_, pt, u),
            in_axes=(0, 0, 0, 0, None)))
        dt = timeit(f"P0..P{upto}", fn, x_meas, sol, lin[0], lin[1], lin[2])
        log(f"P0..P{upto} {dt:8.2f} ms   marginal {names[upto]:24s} "
            f"{dt - prev_dt:8.2f} ms")
        prev_dt = dt


if __name__ == "__main__":
    main()
