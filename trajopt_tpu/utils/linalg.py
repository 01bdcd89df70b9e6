"""Small-matrix linear algebra, unrolled for the TPU VPU.

XLA's generic ``cholesky``/``triangular_solve`` on TPU are slow for the tiny
SPD systems iLQR factors (m x m with m = 1..8: Quu blocks): they lower to
loop-heavy kernels with poor occupancy.  These routines unroll the
factorization at trace time over the STATIC dimension, so a batch of B
factorizations is pure element-wise arithmetic — the TPU analog of the
reference's StaticArrays-specialized ``invert!`` paths
(/root/reference/src/cost_functions.jl:278-297).

All routines broadcast over arbitrary leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["chol_small", "chol_solve_small", "solve_psd_small"]


def chol_small(A: jax.Array):
    """Unrolled Cholesky of (..., m, m) SPD matrices.

    Returns (L, ok): lower-triangular L and a boolean (...,) flag that is
    False where a pivot was non-positive (not PD).  No NaNs are produced on
    failure (pivots are clamped), so downstream math stays finite and the
    caller can branch on ``ok``.
    """
    m = A.shape[-1]
    dtype = A.dtype
    cols = []
    ok = jnp.ones(A.shape[:-2], dtype=bool)
    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        d = A[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        ok = ok & (d > 0)
        piv = jnp.sqrt(jnp.maximum(d, tiny))
        L[j][j] = piv
        for i in range(j + 1, m):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / piv
    rows = []
    zero = jnp.zeros(A.shape[:-2], dtype)
    for i in range(m):
        rows.append(jnp.stack(
            [L[i][j] if j <= i else zero for j in range(m)], axis=-1))
    return jnp.stack(rows, axis=-2), ok


def chol_solve_small(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B with unrolled forward/back substitution.

    L: (..., m, m) lower triangular; B: (..., m, k) or (..., m).
    """
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    m = L.shape[-1]
    # forward: L y = B
    y = [None] * m
    for i in range(m):
        s = B[..., i, :]
        for j in range(i):
            s = s - L[..., i, j][..., None] * y[j]
        y[i] = s / L[..., i, i][..., None]
    # backward: L^T x = y
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for j in range(i + 1, m):
            s = s - L[..., j, i][..., None] * x[j]
        x[i] = s / L[..., i, i][..., None]
    X = jnp.stack(x, axis=-2)
    return X[..., 0] if vec else X


def solve_psd_small(A: jax.Array, B: jax.Array):
    """Solve A X = B for small SPD A; returns (X, ok)."""
    L, ok = chol_small(A)
    return chol_solve_small(L, B), ok


def inv_small(A: jax.Array) -> jax.Array:
    """Unrolled Gauss-Jordan inverse of (..., m, m) matrices (no pivoting).

    Intended for well-conditioned matrices with dominant diagonal — e.g.
    the (I + C J) combinations of the parallel Riccati scan, whose pivots
    are 1 + nonnegative.  Pure element-wise arithmetic, batch-broadcasting.
    """
    m = A.shape[-1]
    # Augment [A | I] as a list of rows of (..., 2m) blocks.
    eye = jnp.eye(m, dtype=A.dtype)
    rows = [jnp.concatenate([A[..., i, :],
                             jnp.broadcast_to(eye[i], A.shape[:-2] + (m,))],
                            axis=-1) for i in range(m)]
    for i in range(m):
        piv = rows[i][..., i:i + 1]
        rows[i] = rows[i] / piv
        for j in range(m):
            if j != i:
                rows[j] = rows[j] - rows[j][..., i:i + 1] * rows[i]
    return jnp.stack([rows[i][..., m:] for i in range(m)], axis=-2)


def tri_solve_small(L: jax.Array, B: jax.Array, trans: bool = False):
    """Solve L X = B (or L^T X = B with ``trans``) by unrolled substitution.

    L: (..., m, m) lower triangular; B: (..., m, k) or (..., m).  Pure
    broadcast arithmetic — no solve_triangular custom call, so it stays
    inside XLA loop fusions regardless of batch layout (see
    SolverOptions.riccati_body).
    """
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    m = L.shape[-1]
    x = [None] * m
    if not trans:
        for i in range(m):
            s = B[..., i, :]
            for j in range(i):
                s = s - L[..., i, j][..., None] * x[j]
            x[i] = s / L[..., i, i][..., None]
    else:
        for i in reversed(range(m)):
            s = B[..., i, :]
            for j in range(i + 1, m):
                s = s - L[..., j, i][..., None] * x[j]
            x[i] = s / L[..., i, i][..., None]
    X = jnp.stack(x, axis=-2)
    return X[..., 0] if vec else X
