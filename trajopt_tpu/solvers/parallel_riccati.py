"""Parallel-in-time Riccati backward pass via ``jax.lax.associative_scan``.

The reference's Riccati recursion is strictly sequential in the knot index
(SURVEY.md §3.5 backward pass; §5 'long-context').  On TPU a sequential scan
costs O(N) small-kernel latencies; this module computes the SAME cost-to-go
sequence in O(log N) depth with the associative combination of conditional
value functions (PAPERS.md: "The Parallelization of Riccati Recursion",
arXiv:1809.06360; Särkkä & García-Fernández's temporal parallelization of
LQT) — the framework's knot-axis ("sequence/context") parallelism.

Element representation for one interval:
    V(x, z) = 1/2 x'Jx - eta'x + quad(z - Ax - b; C)
(A, b, C, eta, J), combined by minimizing over the intermediate state:
    M1 = (I + C1 J2)^-1,  M2 = (I + J2 C1)^-1
    A  = A2 M1 A1
    b  = A2 M1 (b1 + C1 eta2) + b2
    C  = A2 M1 C1 A2' + C2
    eta= A1' M2 (eta2 - J2 b1) + eta1
    J  = A1' M2 J2 A1 + J1

Per-step init (cross terms lux eliminated by u = v - luu^-1(lux x + lu)):
    A_e = A - B luu^-1 lux          J_e  = lxx - lux' luu^-1 lux
    b_e = -B luu^-1 lu              eta_e= -(lx - lux' luu^-1 lu)
    C_e = B luu^-1 B'
terminal element: (0, 0, 0, -lx_T, lxx_T).

The suffix scan yields (S_k, s_k) = (J_k, -eta_k) at every knot; the gains
are then recovered element-wise from the ORIGINAL blocks exactly as in the
sequential pass.  With rho = 0 this matches the sequential backward pass to
round-off; with rho > 0 the regularization enters through luu (a slightly
different — also standard — regularized recursion).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.linalg import chol_small, chol_solve_small, inv_small

__all__ = ["parallel_riccati_gains"]


class _Elem(NamedTuple):
    A: jax.Array    # (T, n, n)
    b: jax.Array    # (T, n)
    C: jax.Array    # (T, n, n)
    eta: jax.Array  # (T, n)
    J: jax.Array    # (T, n, n)


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """fn(earlier, later): minimize over the shared intermediate state."""
    n = e1.A.shape[-1]
    I = jnp.eye(n, dtype=e1.A.dtype)
    M1 = inv_small(I + e1.C @ e2.J)
    M2 = inv_small(I + e2.J @ e1.C)
    A = e2.A @ M1 @ e1.A
    b = (e2.A @ (M1 @ (e1.b + _mv(e1.C, e2.eta))[..., None]))[..., 0] + e2.b
    C = e2.A @ M1 @ e1.C @ _T(e2.A) + e2.C
    eta = _mv(_T(e1.A) @ M2, e2.eta - _mv(e2.J, e1.b)) + e1.eta
    J = _T(e1.A) @ M2 @ e2.J @ e1.A + e1.J
    J = 0.5 * (J + _T(J))
    C = 0.5 * (C + _T(C))
    return _Elem(A=A, b=b, C=C, eta=eta, J=J)


def _mv(M, v):
    return (M @ v[..., None])[..., 0]


def parallel_riccati_gains(A, B, lxx, luu, lux, lx, lu, rho):
    """Compute iLQR gains with a parallel suffix scan over the knot axis.

    Args: A (T,n,n), B (T,n,m), lxx (T+1,n,n), luu (T,m,m), lux (T,m,n),
    lx (T+1,n), lu (T,m), rho scalar.  Returns (K, d, dV1, dV2, fail) with
    the same semantics as the sequential backward pass.
    """
    T, n, m = B.shape[0], B.shape[1], B.shape[2]
    dtype = A.dtype
    eye_m = jnp.eye(m, dtype=dtype)

    luu_r = luu + rho * eye_m  # regularization folded into the control cost
    Lu, ok_u = chol_small(0.5 * (luu_r + _T(luu_r)))
    luu_inv_lux = chol_solve_small(Lu, lux)              # (T, m, n)
    luu_inv_lu = chol_solve_small(Lu, lu)                # (T, m)
    luu_inv_Bt = chol_solve_small(Lu, _T(B))             # (T, m, n)

    A_e = A - B @ luu_inv_lux
    b_e = -_mv(B, luu_inv_lu)
    C_e = B @ luu_inv_Bt
    J_e = lxx[:-1] - _T(lux) @ luu_inv_lux
    eta_e = -(lx[:-1] - _mv(_T(lux), luu_inv_lu))

    # terminal element
    zero_n = jnp.zeros((1, n, n), dtype)
    elems = _Elem(
        A=jnp.concatenate([A_e, zero_n], axis=0),
        b=jnp.concatenate([b_e, jnp.zeros((1, n), dtype)], axis=0),
        C=jnp.concatenate([C_e, zero_n], axis=0),
        eta=jnp.concatenate([eta_e, -lx[-1:]], axis=0),
        J=jnp.concatenate([J_e, lxx[-1:]], axis=0),
    )

    # reverse=True composes as fn(later_suffix, earlier_elem); our
    # _combine takes (earlier, later), hence the argument swap.
    suffix = jax.lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                      reverse=True)
    S = suffix.J       # (T+1, n, n): cost-to-go Hessian at each knot
    s = -suffix.eta    # (T+1, n):    cost-to-go gradient at each knot

    # Gains from the ORIGINAL blocks, element-wise over k (no recursion).
    S1, s1 = S[1:], s[1:]                                 # V_{k+1}
    Qu = lu + _mv(_T(B), s1)
    Qux = lux + _T(B) @ S1 @ A
    Quu = luu + _T(B) @ S1 @ B
    Quu_reg = Quu + rho * eye_m
    L, ok = chol_small(0.5 * (Quu_reg + _T(Quu_reg)))
    K = -chol_solve_small(L, Qux)
    d = -chol_solve_small(L, Qu)
    dV1 = jnp.sum(jnp.einsum("km,km->k", d, Qu))
    dV2 = 0.5 * jnp.sum(jnp.einsum("km,kmq,kq->k", d, Quu, d))
    fail = (~jnp.all(ok)) | (~jnp.all(ok_u)) | (~jnp.all(jnp.isfinite(S))) \
        | (~jnp.all(jnp.isfinite(d)))
    return K, d, dV1, dV2, fail
