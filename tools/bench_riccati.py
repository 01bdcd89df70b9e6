"""Standalone TPU benchmark: Riccati backward-pass variants.

Isolates the Riccati recursion on synthetic (but SPD/sane) expansion data
at the bench shape.  One sync per timing (CLAUDE.md "AXON SLOW MODE").

History: a 342-LoC Pallas batch-minor kernel (double-buffered HBM->VMEM
DMA, lane-axis batch) lived at trajopt_tpu/ops/riccati_kernel.py until the
r2 regime sweep showed it ~22 ms FLAT (fixed-overhead-bound) while the
vmapped scan tracks the data: it LOST in every regime, so it was deleted
(VERDICT r1 #8).  Measured 2026-08-21 on v5e:

    B=128  T=512   pallas 21.67 ms   scan 0.35 ms   chol_small 0.33 ms
    B=128  T=101   pallas 22.46 ms   scan 0.33 ms   chol_small 0.41 ms
    B=2048 T=100   pallas 21.74 ms   scan 0.63 ms   chol_small 0.48 ms

The scan is near the HBM speed-of-light for this recursion (reads ~400 MB
of expansion blocks at B=2048); the latency-bound regime is served by the
associative-scan parallel Riccati (SolverOptions(riccati="parallel")).

r5 CAVEAT (2026-08-21): these standalone numbers are LAYOUT-FLATTERED.
The synthetic inputs here carry default (knot-major) layouts, where the
matmul scan compiles to its fast form (0.63 ms).  Inside the solver, XLA
lays the producer outputs out batch-minor and the SAME scan measures
~99 ms/iteration at B=2048 — the per-knot dot_generals force per-step
relayouts.  SolverOptions.riccati_body="mulsum" (broadcast-mult+reduce,
now the default) is layout-insensitive (~15 ms on solver-layout inputs,
RTI 38.4k -> 122k solves/s end-to-end).  Standalone microbenchmarks whose
inputs have different layouts than the real producers do not transfer.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=20):
    """Dependency-chained timing: rep i+1's input depends on rep i's
    output, so reps serialize on device regardless of queueing; one sync
    at the end (CLAUDE.md "AXON SLOW MODE")."""
    out = jax.block_until_ready(fn(*args))
    first = jax.tree_util.tree_leaves(out)[0]
    eps = (first.ravel()[0] * 0).astype(args[0].dtype)
    t0 = time.time()
    for _ in range(reps):
        out = fn(args[0] + eps, *args[1:])
        eps = (jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0).astype(
            args[0].dtype)
    jax.block_until_ready(out)
    log(f"{name:34s} {(time.time() - t0) / reps * 1e3:8.2f} ms")
    return out


def main():
    Bt, T, n, m = (int(os.environ.get("RB_B", 2048)),
                   int(os.environ.get("RB_T", 100)), 13, 4)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.float32
    A = jnp.eye(n, dtype=dt)[None, None] + 0.05 * jax.random.normal(
        ks[0], (Bt, T, n, n), dt)
    B = 0.05 * jax.random.normal(ks[1], (Bt, T, n, m), dt)
    W = jax.random.normal(ks[2], (Bt, T + 1, n, n), dt)
    lxx = 0.01 * jnp.einsum("btij,btkj->btik", W, W) + jnp.eye(n, dtype=dt)
    lu_w = jax.random.normal(ks[3], (Bt, T, m, m), dt)
    luu = 0.01 * jnp.einsum("btij,btkj->btik", lu_w, lu_w) + jnp.eye(m, dtype=dt)
    lux = 0.01 * jax.random.normal(ks[4], (Bt, T, m, n), dt)
    lx = jax.random.normal(ks[5], (Bt, T + 1, n), dt)
    lu = jax.random.normal(ks[6], (Bt, T, m), dt)
    rho = jnp.full((Bt,), 1e-6, dt)

    log(f"riccati bench: B={Bt} T={T} n={n} m={m} device={jax.devices()[0]}")

    # scan reference: same recursion via vmapped lax.scan of tiny matmuls
    def scan_one(A_, B_, lxx_, luu_, lux_, lx_, lu_, rho_):
        def step(carry, inp):
            Vx, Vxx = carry
            a, b, qxx, quu, qux, qx, qu = inp
            Qx = qx + a.T @ Vx
            Qu = qu + b.T @ Vx
            Qxx = qxx + a.T @ Vxx @ a
            Quu = quu + b.T @ Vxx @ b + rho_ * jnp.eye(m, dtype=dt)
            Qux = qux + b.T @ Vxx @ a
            L = jnp.linalg.cholesky(Quu)
            Kk = jax.scipy.linalg.cho_solve((L, True), Qux)
            dk = jax.scipy.linalg.cho_solve((L, True), Qu)
            Vx_n = Qx + Kk.T @ Quu @ dk - Kk.T @ Qu - Qux.T @ dk
            Vxx_n = Qxx + Kk.T @ Quu @ Kk - Kk.T @ Qux - Qux.T @ Kk
            dV1 = dk @ Qu
            dV2 = 0.5 * dk @ Quu @ dk
            return (Vx_n, 0.5 * (Vxx_n + Vxx_n.T)), (Kk, dk, dV1, dV2)

        inputs = (A_[::-1], B_[::-1], lxx_[:-1][::-1], luu_[::-1],
                  lux_[::-1], lx_[:-1][::-1], lu_[::-1])
        (Vx, Vxx), (K_, d_, dV1_, dV2_) = jax.lax.scan(
            step, (lx_[-1], lxx_[-1]), inputs, unroll=8)
        return K_[::-1], d_[::-1], jnp.sum(dV1_), jnp.sum(dV2_)

    scan_fn = jax.jit(jax.vmap(scan_one))
    K2, d2, dV12, dV22 = timeit("vmapped scan (XLA)", scan_fn,
                                A, B, lxx, luu, lux, lx, lu, rho)

    # the solver's actual small-matrix path
    from trajopt_tpu.utils.linalg import chol_small, chol_solve_small

    def scan_chol_small(A_, B_, lxx_, luu_, lux_, lx_, lu_, rho_):
        def step(carry, inp):
            Vx, Vxx = carry
            a, b, qxx, quu, qux, qx, qu = inp
            Qx = qx + a.T @ Vx
            Qu = qu + b.T @ Vx
            Qxx = qxx + a.T @ Vxx @ a
            Quu = quu + b.T @ Vxx @ b + rho_ * jnp.eye(m, dtype=dt)
            Qux = qux + b.T @ Vxx @ a
            L, ok = chol_small(0.5 * (Quu + Quu.T))
            Kk = -chol_solve_small(L, Qux)
            dk = -chol_solve_small(L, Qu)
            Vx_n = Qx + Kk.T @ Quu @ dk + Kk.T @ Qu + Qux.T @ dk
            Vxx_n = Qxx + Kk.T @ Quu @ Kk + Kk.T @ Qux + Qux.T @ Kk
            return (Vx_n, 0.5 * (Vxx_n + Vxx_n.T)), (Kk, dk)

        inputs = (A_[::-1], B_[::-1], lxx_[:-1][::-1], luu_[::-1],
                  lux_[::-1], lx_[:-1][::-1], lu_[::-1])
        (Vx, Vxx), (K_, d_) = jax.lax.scan(
            step, (lx_[-1], lxx_[-1]), inputs, unroll=8)
        return K_[::-1], d_[::-1]

    timeit("vmapped scan (chol_small)", jax.jit(jax.vmap(scan_chol_small)),
           A, B, lxx, luu, lux, lx, lu, rho)


if __name__ == "__main__":
    main()
