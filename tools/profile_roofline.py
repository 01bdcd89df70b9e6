"""Profiler-measured HBM bandwidth of the steady RTI MPC step (VERDICT r4 #2).

Captures a jax.profiler device trace around a chained window of steady
fixed-schedule MPC steps (the bench.py flagship config), then analyzes the
xplane protobuf with xprof/tensorboard_plugin_profile to report MEASURED
device time and HBM bytes — replacing the XLA cost-analysis inference
(cost-analysis bytes count materializations fusion eliminates; the profiler
counts what the memory system actually moved).

Run on the real TPU (no other TPU process!):
    python3 tools/profile_roofline.py [steps]
"""
import os
import sys
import glob
import json
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_HBM_BW = 819e9  # v5e


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import bench
    from trajopt_tpu import mpc
    from trajopt_tpu.solvers.altro import altro_solve

    dtype = jnp.float32
    B, N, tf = 2048, 101, 5.0
    cold_opts = dict(
        penalty_scaling=100.0, penalty_initial=10.0, penalty_max=1e6,
        jacobian_mode="exact", constraint_tolerance=5e-4, cost_tolerance=1e-3,
        cost_tolerance_intermediate=1e-1, gradient_tolerance=1e-4,
        gradient_tolerance_intermediate=1e-3, bp_reg_initial=1e-6,
        iterations=120, iterations_outer=5, iterations_inner=40,
        error_state=bool(int(os.environ.get("BENCH_ES", 0))),
        errstate_impl=os.environ.get("BENCH_ES_IMPL", "concat"),
        record_stats=False)
    mpc_opts = dict(cold_opts)
    mpc_opts.update(iterations=6, iterations_outer=2, iterations_inner=5,
                    iterations_linesearch=1, line_search_min_alpha=1e-4,
                    final_polish=False, jacobian_mode="approx1",
                    linearize_dtype="bfloat16", record_final_cost=False)

    dm, obj, blocks, x0, times, dts, opts_cold, n, m, hover = bench.build(
        B, N, tf, dtype, cold_opts)
    from trajopt_tpu.solvers import SolverOptions
    opts_mpc = SolverOptions(**mpc_opts)
    opts_altro = opts_cold.replace(projected_newton=True,
                                   al_phase_tolerance=1e-1,
                                   projected_newton_iterations=3)

    key = jax.random.PRNGKey(0)
    kx, kp = jax.random.split(key)
    x0s = x0[None, :] + 0.05 * jax.random.normal(kx, (B, n), dtype)
    us0 = jnp.full((B, N, m), hover, dtype)

    print("cold seed solve...", file=sys.stderr, flush=True)
    cold = jax.jit(jax.vmap(lambda a, b: altro_solve(
        dm, obj, blocks, a, b, times, dts, opts_altro)))
    sol = jax.block_until_ready(cold(x0s, us0))

    controller = mpc.make_mpc_controller(
        dm, obj, blocks, times, dts, opts_mpc, batched=True,
        schedule=(1,), relin_every=2)

    @jax.jit
    def step(sol, key):
        noise = 0.01 * jax.random.normal(key, (B, n), dtype)
        return controller(sol.xs[:, 1] + noise, sol)

    # warm up + compile
    k = kp
    for _ in range(3):
        k, sub = jax.random.split(k)
        sol = step(sol, sub)
    jax.block_until_ready(sol)

    logdir = "/tmp/roofline_trace"
    os.system(f"rm -rf {logdir}")
    # ONE chained window, ONE final sync (AXON timing rules, CLAUDE.md)
    t0 = time.time()
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            k, sub = jax.random.split(k)
            sol = step(sol, sub)
        jax.block_until_ready(sol)
    wall = time.time() - t0
    print(f"trace captured: {steps} steps in {wall:.2f}s "
          f"({1e3 * wall / steps:.1f} ms/step wall)", file=sys.stderr)

    analyze(logdir, steps, wall)


def analyze(logdir, steps, wall):
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    print(f"xplane files: {xplanes}", file=sys.stderr)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured"}))
        return
    out = {"steps": steps, "wall_s": wall}
    # xprof's op-stats pipeline computes device duration and per-op memory
    # bandwidth from the hardware's performance counters.
    from xprof.convert import raw_to_tool_data as rtd
    params = {"use_saved_result": False}
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", params)
    tab = json.loads(data if isinstance(data, str) else data.decode())[0]
    cols = [c["id"] for c in tab["cols"]]
    ix = {c: i for i, c in enumerate(cols)}
    import collections
    dev_t = bw_t = flop_t = 0.0
    by_type = collections.defaultdict(float)
    for r in tab["rows"]:
        v = [c["v"] for c in r["c"]]
        if v[ix["host_or_device"]] != "Device":
            continue
        t = float(v[ix["total_self_time"]])        # microseconds
        dev_t += t
        bw_t += t * float(v[ix["measured_memory_bw"]] or 0.0)   # GB/s
        flop_t += t * float(v[ix["measured_flop_rate"]] or 0.0)
        by_type[v[ix["type"]]] += t
    out.update(
        device_ms_per_step=round(dev_t / 1e3 / steps, 2),
        measured_hbm_gbps=round(bw_t / dev_t, 1),
        hbm_util_frac=round(bw_t / dev_t / (PEAK_HBM_BW / 1e9), 4),
        measured_gflops=round(flop_t / dev_t, 1),
        top_op_types_ms_per_step={
            k: round(t / 1e3 / steps, 2)
            for k, t in sorted(by_type.items(), key=lambda kv: -kv[1])[:8]},
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
