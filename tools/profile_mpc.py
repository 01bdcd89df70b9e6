"""Micro-profile of the fixed-schedule MPC step components on TPU.

Times each stage of al_solve_fixed(schedule=(1,)) in isolation at the
bench shape (B=2048, N=101 quadrotor) to locate the wall-clock budget.
Diagnostics to stderr; run alone (never concurrent with another TPU
process).

CAVEAT (2026-08-21): isolated stage timings OVERCOUNT what the fused
full-step consumer pays (CLAUDE.md timing-methodology lessons), and this
tool's opts differ from the bench defaults (linearize_dtype=same, LS=2
vs bfloat16, LS=1) — a run today read FULL step 133 ms while the bench
steady loop measured 53 ms/step the same hour.  Use these numbers only
to RANK stages; trust only full-step bench A/Bs for decisions.
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


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))  # compile
    # Dependency-chained reps + ONE final sync: chaining forces device
    # serialization (un-chained dispatches have been observed to complete
    # implausibly fast); a single sync avoids the ~27 ms per-sync charge
    # (CLAUDE.md "AXON SLOW MODE").
    first = jax.tree_util.tree_leaves(out)[0]
    eps = (jnp.ravel(first)[0] * 0).astype(jnp.asarray(args[0]).dtype)
    t0 = time.time()
    for _ in range(reps):
        out = fn(jnp.asarray(args[0]) + eps, *args[1:])
        eps = (jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0).astype(
            jnp.asarray(args[0]).dtype)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    log(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    from trajopt_tpu import mpc
    from trajopt_tpu.dynamics import rollout
    from trajopt_tpu.solvers import SolverOptions
    from trajopt_tpu.solvers.al import (
        al_solve, eval_blocks, init_duals, make_al_functions,
        max_violation_blocks, update_duals,
    )
    from trajopt_tpu.solvers.ilqr import (
        _backward_pass, _forward_pass, _linearize,
    )

    dtype = jnp.float32
    B, N, tf = int(os.environ.get("BENCH_B", 2048)), 101, 5.0
    opts_kw = dict(
        penalty_scaling=100.0, penalty_initial=0.1,
        constraint_tolerance=5e-4, cost_tolerance=1e-3,
        cost_tolerance_intermediate=1e-2, gradient_tolerance=1e-4,
        gradient_tolerance_intermediate=1e-3, bp_reg_initial=1e-6,
        iterations=6, iterations_outer=2, iterations_inner=5,
        iterations_linesearch=2, line_search_min_alpha=1e-4,
        final_polish=False,
        jacobian_mode=os.environ.get("BENCH_JM", "approx1"),
        linearize_dtype=os.environ.get("BENCH_LD", "same"),
        record_stats=False,
    )
    dm, obj, blocks, x0, times, dts, opts, n, m, hover = build(
        B, N, tf, dtype, opts_kw)

    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + 0.05 * jax.random.normal(key, (B, n), dtype)
    us0 = jnp.full((B, N, m), hover, dtype)

    log(f"profile: B={B} N={N} device={jax.devices()[0]}")

    # Cold solve to get a realistic warm-start point.
    cold_opts = dict(opts_kw)
    cold_opts.update(iterations=120, iterations_outer=8, iterations_inner=40,
                     iterations_linesearch=16, jacobian_mode="exact")
    opts_cold = SolverOptions(**cold_opts)
    cold = jax.jit(jax.vmap(
        lambda a, b: al_solve(dm, obj, blocks, a, b, times, dts, opts_cold)))
    sol = jax.block_until_ready(cold(x0s, us0))
    log(f"cold: converged {int(sol.converged.sum())}/{B}")

    xs, us = sol.xs, sol.us
    lams, mus = sol.duals, sol.penalties

    # --- components, each jitted + vmapped over B ---
    def f_rollout(x, u):
        return rollout(dm, x, u, times, dts)

    def f_lin(x, u):
        return _linearize(dm, x, u, times, dts, opts)

    timeit("open-loop rollout", jax.jit(jax.vmap(f_rollout)), x0s, us)
    AB = timeit("linearize (approx)", jax.jit(jax.vmap(f_lin)), xs, us)

    def f_expand(xs_, us_, lam_, mu_):
        _, expand_fn = make_al_functions(obj, blocks, lam_, mu_)
        return expand_fn(xs_, us_)

    timeit("AL expansion only", jax.jit(jax.vmap(f_expand)), xs, us, lams, mus)

    # per-scenario AL functions need per-scenario duals: close over vmap
    def f_bp(xs_, us_, lam_, mu_, AB_):
        cost_fn, expand_fn = make_al_functions(obj, blocks, lam_, mu_)
        rho = jnp.asarray(1e-6, dtype)
        return _backward_pass(dm, expand_fn, xs_, us_, times, dts, rho,
                              jnp.ones((), dtype), opts, AB=AB_)

    bp = timeit("AL expand + backward pass",
                jax.jit(jax.vmap(f_bp)), xs, us, lams, mus, AB)

    def f_fp(xs_, us_, lam_, mu_, K, d, dV1, dV2, x0_):
        cost_fn, _ = make_al_functions(obj, blocks, lam_, mu_)
        J0 = cost_fn(xs_, us_)
        return _forward_pass(dm, cost_fn, xs_, us_, K, d, dV1, dV2, J0, x0_,
                             times, dts, opts)

    timeit("J0 + forward pass (2 alpha)", jax.jit(jax.vmap(f_fp)),
           xs, us, lams, mus, bp.K, bp.d, bp.dV1, bp.dV2, x0s)

    def f_al_update(xs_, us_, lam_, mu_):
        cvals = eval_blocks(blocks, xs_, us_)
        viol = max_violation_blocks(blocks, cvals)
        lam2 = update_duals(blocks, lam_, mu_, cvals, opts)
        return viol, lam2

    timeit("constraint eval + dual upd",
           jax.jit(jax.vmap(f_al_update)), xs, us, lams, mus)

    def f_final_cost(xs_, us_):
        return obj.cost(xs_, us_)

    timeit("objective cost", jax.jit(jax.vmap(f_final_cost)), xs, us)

    # --- the full step for comparison ---
    controller = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                         batched=True, schedule=(1,),
                                         relin_every=2)
    x_meas = sol.xs[:, 1, :]
    timeit("FULL mpc step", controller, x_meas, sol)

    # --- cross-step Jacobian carry components ---
    from trajopt_tpu.solvers.fixed import refresh_linearization
    linwin = int(os.environ.get("BENCH_LINWIN", 20))
    lin = mpc.init_lin_carry(dm, sol, times, dts, opts, batched=True)

    def f_shift(A_, B_):
        A2, B2, _ = mpc.shift_linearization((A_, B_, lin[2]))
        return A2, B2

    timeit("lin shift (concat)", jax.jit(jax.vmap(f_shift)), lin[0], lin[1])

    def f_refresh(xs_, us_, A_, B_, ptr_):
        return refresh_linearization(dm, (A_, B_), xs_[:-1], us_[:-1],
                                     times[:-1], dts[:-1], opts, ptr_, linwin)

    timeit(f"lin refresh (w={linwin})",
           jax.jit(jax.vmap(f_refresh, in_axes=(0, 0, 0, 0, None),
                            out_axes=((0, 0), None))),
           xs, us, lin[0], lin[1], lin[2])

    ctrl_carry = mpc.make_mpc_controller(dm, obj, blocks, times, dts, opts,
                                         batched=True, schedule=(1,),
                                         lin_window=linwin)
    timeit("FULL mpc step (lin carry)", ctrl_carry, x_meas, sol, lin)


if __name__ == "__main__":
    main()
