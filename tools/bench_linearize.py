"""A/B micro-benchmark of continuous-dynamics linearization variants on TPU.

The RTI MPC step budget is dominated by the batched jacfwd linearization
(CLAUDE.md measured breakdown).  The production path (solvers/ilqr.py
_linearize_knots) uses TWO separate vmapped jacfwd passes (argnums=0 then
argnums=1), each of which traces the primal dynamics again.  Candidates:

  two-jacfwd   : production path (2 primal traces, 13+4 tangents)
  joint-jacfwd : jax.jacfwd(f, argnums=(0,1)) — ONE primal trace pushing all
                 17 tangents, no z=[x;u] concat relayout
  manual-jvp   : vmap of jax.jvp over an explicit 17-row (dx,du) basis
  jacrev       : reverse mode — 13 cotangents instead of 17 tangents

Timing: dependency-chained reps + ONE final sync (CLAUDE.md TIMING
METHODOLOGY).  Run alone on the TPU (never alongside pytest or bench.py).
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, x, u, t, reps=30):
    out = jax.block_until_ready(fn(x, u, t))
    eps = (jnp.ravel(out[0])[0] * 0).astype(x.dtype)
    t0 = time.time()
    for _ in range(reps):
        out = fn(x + eps, u, t)
        eps = (jnp.ravel(out[0])[0] * 0).astype(x.dtype)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    log(f"{name:24s} {dt * 1e3:8.3f} ms")
    return out


def main():
    from trajopt_tpu.models import Quadrotor

    dtype = jnp.float32
    tdtype = jnp.bfloat16 if os.environ.get("BENCH_LD", "bf16") == "bf16" \
        else dtype
    B = int(os.environ.get("BENCH_B", 2048))
    K = int(os.environ.get("BENCH_N", 101)) - 1
    n, m = 13, 4
    f = Quadrotor().dynamics

    key = jax.random.PRNGKey(0)
    kx, ku = jax.random.split(key)
    x = jax.random.normal(kx, (B, K, n), dtype)
    # keep quaternions unit-ish so the dynamics stay sane
    q = x[..., 3:7]
    x = x.at[..., 3:7].set(q / jnp.linalg.norm(q, axis=-1, keepdims=True))
    u = 3.0 + 0.1 * jax.random.normal(ku, (B, K, m), dtype)
    t = jnp.zeros((B, K), dtype)

    log(f"linearize A/B: B={B} K={K} tangent dtype={tdtype.__name__} "
        f"device={jax.devices()[0]}")

    def cast(fn):
        def run(x_, u_, t_):
            xl, ul = x_.astype(tdtype), u_.astype(tdtype)
            Af, Bf = fn(xl, ul, t_)
            return Af.astype(dtype), Bf.astype(dtype)
        return jax.jit(run)

    def two_jacfwd(xl, ul, tl):
        Af = jax.vmap(jax.vmap(jax.jacfwd(f, argnums=0)))(xl, ul, tl)
        Bf = jax.vmap(jax.vmap(jax.jacfwd(f, argnums=1)))(xl, ul, tl)
        return Af, Bf

    def joint_jacfwd(xl, ul, tl):
        Af, Bf = jax.vmap(jax.vmap(jax.jacfwd(f, argnums=(0, 1))))(xl, ul, tl)
        return Af, Bf

    In = jnp.eye(n, dtype=tdtype)
    Im = jnp.eye(m, dtype=tdtype)
    dxs = jnp.concatenate([In, jnp.zeros((m, n), tdtype)], 0)   # (n+m, n)
    dus = jnp.concatenate([jnp.zeros((n, m), tdtype), Im], 0)   # (n+m, m)

    def manual_jvp(xl, ul, tl):
        def jac1(x_, u_, t_):
            def push(dx, du):
                return jax.jvp(lambda a, b: f(a, b, t_), (x_, u_),
                               (dx, du))[1]
            Jt = jax.vmap(push)(dxs, dus)                        # (n+m, n)
            return Jt[:n].swapaxes(-1, -2), Jt[n:].swapaxes(-1, -2)
        return jax.vmap(jax.vmap(jac1))(xl, ul, tl)

    def jacrev(xl, ul, tl):
        Af, Bf = jax.vmap(jax.vmap(jax.jacrev(f, argnums=(0, 1))))(xl, ul, tl)
        return Af, Bf

    ref = timeit("two-jacfwd (prod)", cast(two_jacfwd), x, u, t)
    for name, fn in [("joint-jacfwd", joint_jacfwd),
                     ("manual-jvp", manual_jvp),
                     ("jacrev", jacrev)]:
        out = timeit(name, cast(fn), x, u, t)
        err = max(float(jnp.max(jnp.abs(out[0] - ref[0]))),
                  float(jnp.max(jnp.abs(out[1] - ref[1]))))
        log(f"  max |diff| vs prod: {err:.2e}")


if __name__ == "__main__":
    main()
