"""Cost functions: quadratic/diagonal/LQR and quaternion-geodesic costs.

TPU-native re-design of the reference's cost layer
(/root/reference/src/cost_functions.jl, /root/reference/src/lie_costs.jl).

The reference represents each knot's cost as a type-specialized StaticArrays
object with hand-written gradient/Hessian methods (cost_functions.jl:89-233).
Here a cost is a frozen pytree of coefficient arrays; an ``Objective`` stacks
N of them along a leading axis so evaluation/expansion over the whole
trajectory is one ``vmap`` (and over scenarios, a second ``vmap``) — the
zero-allocation inner loops of the reference become fused XLA element-wise +
matmul ops on (N, n, n)-shaped tensors.

Cost form (cost_functions.jl:34, docstring):
    J(x, u) = 1/2 x'Qx + 1/2 u'Ru + u'Hx + q'x + r'u + c
with the control terms dropped at the terminal knot (cost_functions.jl:92).
``DiagonalQuatCost`` adds the geodesic term ``w * min(1 + qf'q, 1 - qf'q)``
(lie_costs.jl:68-95).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "DiagonalCost",
    "QuadraticCost",
    "DiagonalQuatCost",
    "DiagonalLieCost",
    "ErrorQuadratic",
    "GenericCost",
    "LQRCost",
    "QuatLQRCost",
    "CostExpansion",
    "change_dimension",
    "invert",
]


def _warn_not_psd(name: str, M) -> None:
    """Definiteness warning at construction (cost_functions.jl:437-444).

    Only fires for concrete (non-traced) inputs — trace-time validation,
    like the reference's constructor-time ``@warn``.
    """
    import warnings

    try:
        arr = np.asarray(M)
    except Exception:
        return  # traced value: skip
    if arr.ndim == 1:
        bad = (arr < 0).any()
    else:
        bad = (np.linalg.eigvalsh((arr + arr.T) / 2) < -1e-10).any()
    if bad:
        warnings.warn(f"{name} is not positive semidefinite", stacklevel=3)


@struct.dataclass
class CostExpansion:
    """Second-order expansion of a cost about (x, u).

    Matches the blocks the reference writes into its ``QuadraticCostFunction``
    expansions (cost_functions.jl:137-233): gradient (q, r) and Hessian
    (Q, R, H) with H the (m, n) cross term d2J/dudx.
    """

    xx: jax.Array  # (n, n)
    uu: jax.Array  # (m, m)
    ux: jax.Array  # (m, n)
    x: jax.Array  # (n,)
    u: jax.Array  # (m,)
    c: jax.Array  # scalar


def _sym(M):
    return 0.5 * (M + M.T)


def _concrete_all_zero(M) -> bool:
    """True iff ``M`` is a CONCRETE all-zero array.  Traced values return
    True (validation is skipped under jit, mirroring ``_warn_not_psd``);
    device arrays are checked via ``np.asarray`` only when already host-side
    numpy — committed device arrays also skip, so constructor-time checks
    never force a device->host transfer (the axon slow-mode trigger,
    CLAUDE.md)."""
    if isinstance(M, jax.core.Tracer):
        return True
    if isinstance(M, jax.Array):
        try:
            accel = any(d.platform != "cpu" for d in M.devices())
        except Exception:
            accel = True
        if accel:
            # accelerator-resident: np.asarray would be a D2H transfer —
            # skip rather than trigger the permanent axon slow mode
            return True
    try:
        arr = np.asarray(M)
    except Exception:
        return True
    return not arr.any()


@struct.dataclass
class QuadraticCost:
    """Dense quadratic cost (cost_functions.jl:422-519).

    Q: (n, n), R: (m, m), H: (m, n) cross term, q: (n,), r: (m,), c: scalar.
    """

    Q: jax.Array
    R: jax.Array
    H: jax.Array
    q: jax.Array
    r: jax.Array
    c: jax.Array

    @property
    def n(self) -> int:
        return self.q.shape[-1]

    @property
    def m(self) -> int:
        return self.r.shape[-1]

    @classmethod
    def create(cls, Q, R, H=None, q=None, r=None, c=0.0, dtype=None):
        Q = jnp.asarray(Q, dtype=dtype)
        R = jnp.asarray(R, dtype=dtype)
        if Q.ndim == 1:
            Q = jnp.diag(Q)
        if R.ndim == 1:
            R = jnp.diag(R)
        n, m = Q.shape[0], R.shape[0]
        _warn_not_psd("Q", Q)
        _warn_not_psd("R", R)
        H = jnp.zeros((m, n), Q.dtype) if H is None else jnp.asarray(H, Q.dtype)
        q = jnp.zeros((n,), Q.dtype) if q is None else jnp.asarray(q, Q.dtype)
        r = jnp.zeros((m,), Q.dtype) if r is None else jnp.asarray(r, Q.dtype)
        return cls(Q=Q, R=R, H=H, q=q, r=r, c=jnp.asarray(c, Q.dtype))

    # -- evaluation (cost_functions.jl:89-104) --------------------------------
    def stage_cost(self, x, u):
        J = 0.5 * x @ self.Q @ x + self.q @ x + self.c
        J = J + 0.5 * u @ self.R @ u + self.r @ u + u @ self.H @ x
        return J

    def term_cost(self, x):
        return 0.5 * x @ self.Q @ x + self.q @ x + self.c

    # -- expansion (cost_functions.jl:137-233) --------------------------------
    def expansion(self, x, u) -> CostExpansion:
        return CostExpansion(
            xx=_sym(self.Q),
            uu=_sym(self.R),
            ux=self.H,
            x=self.Q @ x + self.q + self.H.T @ u,
            u=self.R @ u + self.r + self.H @ x,
            c=self.stage_cost(x, u),
        )

    def term_expansion(self, x) -> CostExpansion:
        m = self.m
        dt = self.Q.dtype
        return CostExpansion(
            xx=_sym(self.Q),
            uu=jnp.zeros((m, m), dt),
            ux=jnp.zeros((m, self.n), dt),
            x=self.Q @ x + self.q,
            u=jnp.zeros((m,), dt),
            c=self.term_cost(x),
        )

    def __add__(self, other):  # cost addition (cost_functions.jl:260-270)
        if isinstance(other, ErrorQuadratic):  # lie_costs.jl:278
            return other + self
        o = _as_dense(other)
        return QuadraticCost(
            Q=self.Q + o.Q, R=self.R + o.R, H=self.H + o.H,
            q=self.q + o.q, r=self.r + o.r, c=self.c + o.c,
        )


@struct.dataclass
class DiagonalCost:
    """Diagonal quadratic cost (cost_functions.jl:326-401). Q, R stored as vectors."""

    Qd: jax.Array  # (n,)
    Rd: jax.Array  # (m,)
    q: jax.Array
    r: jax.Array
    c: jax.Array

    @property
    def n(self) -> int:
        return self.q.shape[-1]

    @property
    def m(self) -> int:
        return self.r.shape[-1]

    @classmethod
    def create(cls, Qd, Rd, q=None, r=None, c=0.0, dtype=None):
        Qd = jnp.asarray(Qd, dtype=dtype)
        Rd = jnp.asarray(Rd, dtype=dtype)
        if Qd.ndim == 2:
            Qd = jnp.diag(Qd)
        if Rd.ndim == 2:
            Rd = jnp.diag(Rd)
        n, m = Qd.shape[0], Rd.shape[0]
        _warn_not_psd("Q", Qd)  # cost_functions.jl:337-343
        _warn_not_psd("R", Rd)
        q = jnp.zeros((n,), Qd.dtype) if q is None else jnp.asarray(q, Qd.dtype)
        r = jnp.zeros((m,), Qd.dtype) if r is None else jnp.asarray(r, Qd.dtype)
        return cls(Qd=Qd, Rd=Rd, q=q, r=r, c=jnp.asarray(c, Qd.dtype))

    def stage_cost(self, x, u):
        J = 0.5 * jnp.sum(self.Qd * x * x) + self.q @ x + self.c
        return J + 0.5 * jnp.sum(self.Rd * u * u) + self.r @ u

    def term_cost(self, x):
        return 0.5 * jnp.sum(self.Qd * x * x) + self.q @ x + self.c

    def expansion(self, x, u) -> CostExpansion:
        dt = self.Qd.dtype
        return CostExpansion(
            xx=jnp.diag(self.Qd),
            uu=jnp.diag(self.Rd),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self.Qd * x + self.q,
            u=self.Rd * u + self.r,
            c=self.stage_cost(x, u),
        )

    def term_expansion(self, x) -> CostExpansion:
        dt = self.Qd.dtype
        return CostExpansion(
            xx=jnp.diag(self.Qd),
            uu=jnp.zeros((self.m, self.m), dt),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self.Qd * x + self.q,
            u=jnp.zeros((self.m,), dt),
            c=self.term_cost(x),
        )

    def __add__(self, other):
        if isinstance(other, DiagonalCost):
            return DiagonalCost(
                Qd=self.Qd + other.Qd, Rd=self.Rd + other.Rd,
                q=self.q + other.q, r=self.r + other.r, c=self.c + other.c,
            )
        if isinstance(other, ErrorQuadratic):  # lie_costs.jl:278
            return other + self
        return _as_dense(self) + other


@struct.dataclass
class DiagonalQuatCost:
    """Diagonal quadratic + quaternion geodesic cost (lie_costs.jl:34-95).

    J = 1/2 x'Qx + q'x + c + 1/2 u'Ru + r'u + w * min(1 + qf'q, 1 - qf'q)
    where q = x[q_ind].  ``q_ind`` is static (trace-time) like the
    reference's type-level index (lie_costs.jl:42).
    """

    Qd: jax.Array
    Rd: jax.Array
    q: jax.Array
    r: jax.Array
    c: jax.Array
    w: jax.Array  # scalar geodesic weight
    q_ref: jax.Array  # (4,)
    q_ind: Tuple[int, int, int, int] = struct.field(pytree_node=False, default=(3, 4, 5, 6))

    @property
    def n(self) -> int:
        return self.q.shape[-1]

    @property
    def m(self) -> int:
        return self.r.shape[-1]

    def _geodesic(self, x):
        qv = x[jnp.array(self.q_ind)]
        dq = self.q_ref @ qv
        return self.w * jnp.minimum(1 + dq, 1 - dq), dq

    def stage_cost(self, x, u):
        base = 0.5 * jnp.sum(self.Qd * x * x) + self.q @ x + self.c
        base = base + 0.5 * jnp.sum(self.Rd * u * u) + self.r @ u
        geo, _ = self._geodesic(x)
        return base + geo

    def term_cost(self, x):
        base = 0.5 * jnp.sum(self.Qd * x * x) + self.q @ x + self.c
        geo, _ = self._geodesic(x)
        return base + geo

    def _grad_x(self, x):
        # Sign-aware geodesic gradient (lie_costs.jl:84-89).
        qv = x[jnp.array(self.q_ind)]
        dq = self.q_ref @ qv
        sign = jnp.where(dq < 0, 1.0, -1.0).astype(x.dtype)
        gx = self.Qd * x + self.q
        gx = gx.at[jnp.array(self.q_ind)].add(sign * self.w * self.q_ref)
        return gx

    def expansion(self, x, u) -> CostExpansion:
        dt = self.Qd.dtype
        # Gauss-Newton treatment: geodesic term contributes gradient only
        # (its Hessian is zero almost everywhere in the quaternion entries
        # because it is linear in q up to the sign switch), matching the
        # reference where hessian! adds nothing beyond Q (lie_costs.jl:59-60,
        # is_diag => Hessian = Diagonal(Q)).
        return CostExpansion(
            xx=jnp.diag(self.Qd),
            uu=jnp.diag(self.Rd),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self._grad_x(x),
            u=self.Rd * u + self.r,
            c=self.stage_cost(x, u),
        )

    def term_expansion(self, x) -> CostExpansion:
        dt = self.Qd.dtype
        return CostExpansion(
            xx=jnp.diag(self.Qd),
            uu=jnp.zeros((self.m, self.m), dt),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self._grad_x(x),
            u=jnp.zeros((self.m,), dt),
            c=self.term_cost(x),
        )

    def __add__(self, other):  # lie_costs.jl:158-167
        assert isinstance(other, (DiagonalCost, DiagonalQuatCost))
        ow = other.w if isinstance(other, DiagonalQuatCost) else 0.0
        return DiagonalQuatCost(
            Qd=self.Qd + other.Qd, Rd=self.Rd + other.Rd,
            q=self.q + other.q, r=self.r + other.r, c=self.c + other.c,
            w=self.w + ow, q_ref=self.q_ref, q_ind=self.q_ind,
        )


@struct.dataclass
class DiagonalLieCost:
    """Diagonal cost over the vector-space state parts plus a geodesic term
    per rotation block (the legacy ``DiagonalLieCost`` behavior the reference
    documents in test/quatcosts.jl:17-93; removed from its v0.7.1 src).

    J(x, u) = 1/2 xv'diag(Qv) xv + qv'xv + c + 1/2 u'diag(Rd) u + r'u
              + sum_i w[i] * min(1 - q_i'qref_i, 1 + q_i'qref_i)

    where ``xv`` are the non-quaternion state entries (positions, velocities,
    rates) and ``q_i = x[quat_inds[i]]`` the i-th unit quaternion.  Generalizes
    ``DiagonalQuatCost`` to any number of rotation blocks (the reference's
    ``LieState(QuatRotation, 3, 6)`` layouts, quatcosts.jl:18-27).  Index sets
    are static (trace-time), mirroring the reference's type-level LieState.
    """

    Qv: jax.Array  # (nv,) diagonal over vector entries
    Rd: jax.Array  # (m,)
    qv: jax.Array  # (nv,) linear term over vector entries
    r: jax.Array  # (m,)
    c: jax.Array  # scalar
    w: jax.Array  # (k,) geodesic weights
    q_refs: jax.Array  # (k, 4) reference quaternions
    quat_inds: Tuple[Tuple[int, int, int, int], ...] = struct.field(pytree_node=False)
    vec_inds: Tuple[int, ...] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, Q, R, q=None, r=None, c=0.0, w=None, q_refs=None,
               quat_inds=((3, 4, 5, 6),), n=None, dtype=None):
        """``Q``/``q`` may be full-state (n,) — quaternion entries are then
        dropped from the quadratic part, and ``w`` defaults to the sum of the
        dropped diagonal entries per rotation (quatcosts.jl:38-45) — or
        already restricted to the vector parts (n - 4k,), in which case ``w``
        defaults to 1 per rotation (quatcosts.jl:20-22).  The two forms are
        told apart by ``len(Q)`` vs the full state dimension ``n``; ``n``
        defaults to ``len(Q)`` (full-state form) the way the reference reads
        it off the LieState, so pass ``n`` explicitly with vector-parts Q."""
        quat_inds = tuple(tuple(int(i) for i in b) for b in quat_inds)
        for b in quat_inds:
            if len(b) != 4:
                raise ValueError(f"quaternion block {b} must have 4 indices")
        k = len(quat_inds)
        Q = jnp.asarray(Q, dtype=dtype)
        if Q.ndim == 2:
            Q = jnp.diag(Q)
        R = jnp.asarray(R, Q.dtype)
        if R.ndim == 2:
            R = jnp.diag(R)
        m = R.shape[0]
        quat_flat = [i for b in quat_inds for i in b]
        if len(set(quat_flat)) != 4 * k:
            raise ValueError("quaternion blocks overlap")
        n = int(n) if n is not None else Q.shape[0]
        if max(quat_flat) >= n:
            raise ValueError(f"quaternion index {max(quat_flat)} >= n={n}")
        vec_inds = tuple(i for i in range(n) if i not in set(quat_flat))
        if Q.shape[0] == n:  # full-state form
            Qv = Q[jnp.array(vec_inds)]
            default_w = jnp.stack([jnp.sum(Q[jnp.array(b)]) for b in quat_inds])
        elif Q.shape[0] == len(vec_inds):  # vector-parts form
            Qv = Q
            default_w = jnp.ones((k,), Q.dtype)
        else:
            raise ValueError(
                f"Q has {Q.shape[0]} entries; expected n={n} (full state) "
                f"or {len(vec_inds)} (vector parts)")
        if q is None:
            qv = jnp.zeros((len(vec_inds),), Q.dtype)
        else:
            q = jnp.asarray(q, Q.dtype)
            qv = q[jnp.array(vec_inds)] if q.shape[0] == n else q
        r = jnp.zeros((m,), Q.dtype) if r is None else jnp.asarray(r, Q.dtype)
        w = default_w if w is None else jnp.atleast_1d(jnp.asarray(w, Q.dtype))
        if q_refs is None:
            q_refs = jnp.tile(jnp.array([1.0, 0, 0, 0], Q.dtype), (k, 1))
        else:
            q_refs = jnp.asarray(q_refs, Q.dtype).reshape(k, 4)
        _warn_not_psd("Q", Qv)
        _warn_not_psd("R", R)
        return cls(Qv=Qv, Rd=R, qv=qv, r=r, c=jnp.asarray(c, Q.dtype),
                   w=w, q_refs=q_refs, quat_inds=quat_inds, vec_inds=vec_inds)

    @property
    def n(self) -> int:
        return len(self.vec_inds) + 4 * len(self.quat_inds)

    @property
    def m(self) -> int:
        return self.r.shape[-1]

    def _geodesic(self, x):
        total = jnp.zeros((), x.dtype)
        for i, b in enumerate(self.quat_inds):
            dq = self.q_refs[i] @ x[jnp.array(b)]
            total = total + self.w[i] * jnp.minimum(1 + dq, 1 - dq)
        return total

    def _vec_cost(self, x):
        xv = x[jnp.array(self.vec_inds)]
        return 0.5 * jnp.sum(self.Qv * xv * xv) + self.qv @ xv + self.c

    def stage_cost(self, x, u):
        return (self._vec_cost(x) + self._geodesic(x)
                + 0.5 * jnp.sum(self.Rd * u * u) + self.r @ u)

    def term_cost(self, x):
        return self._vec_cost(x) + self._geodesic(x)

    def _grad_x(self, x):
        xv = x[jnp.array(self.vec_inds)]
        gx = jnp.zeros((self.n,), x.dtype)
        gx = gx.at[jnp.array(self.vec_inds)].set(self.Qv * xv + self.qv)
        # Sign-aware geodesic gradient per rotation (lie_costs.jl:84-89).
        for i, b in enumerate(self.quat_inds):
            dq = self.q_refs[i] @ x[jnp.array(b)]
            sign = jnp.where(dq < 0, 1.0, -1.0).astype(x.dtype)
            gx = gx.at[jnp.array(b)].set(sign * self.w[i] * self.q_refs[i])
        return gx

    def _hess_xx(self):
        Qfull = jnp.zeros((self.n,), self.Qv.dtype)
        Qfull = Qfull.at[jnp.array(self.vec_inds)].set(self.Qv)
        return jnp.diag(Qfull)

    def expansion(self, x, u) -> CostExpansion:
        dt = self.Qv.dtype
        return CostExpansion(
            xx=self._hess_xx(),
            uu=jnp.diag(self.Rd),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self._grad_x(x),
            u=self.Rd * u + self.r,
            c=self.stage_cost(x, u),
        )

    def term_expansion(self, x) -> CostExpansion:
        dt = self.Qv.dtype
        return CostExpansion(
            xx=self._hess_xx(),
            uu=jnp.zeros((self.m, self.m), dt),
            ux=jnp.zeros((self.m, self.n), dt),
            x=self._grad_x(x),
            u=jnp.zeros((self.m,), dt),
            c=self.term_cost(x),
        )


def _as_dense(cost) -> QuadraticCost:
    if isinstance(cost, QuadraticCost):
        return cost
    if isinstance(cost, DiagonalCost):
        return QuadraticCost.create(jnp.diag(cost.Qd), jnp.diag(cost.Rd),
                                    q=cost.q, r=cost.r, c=cost.c)
    raise TypeError(f"cannot convert {type(cost)} to QuadraticCost")


def invert(cost, terminal: bool = False) -> jax.Array:
    """Structure-aware inverse of the cost Hessian (cost_functions.jl:278-297
    ``invert!``): returns the (n+m, n+m) inverse of
    ``[[Q, H^T], [H, R]]``, picking the cheapest path the structure allows.

    * DiagonalCost (is_diag): elementwise reciprocal on the diagonal.
    * QuadraticCost with zero H (is_blockdiag): per-block inverse.
    * QuadraticCost with a cross term: Schur complement in Q —
      ``S = R - H Q^{-1} H^T``; assembled from ``Q^{-1}`` and ``S^{-1}``.

    All paths use the unrolled Gauss-Jordan ``utils.linalg.inv_small``
    (TPU has no f64 LU kernel; the blocks here are tiny, n+m <= ~20).
    ``terminal=True`` drops the control block (reference semantics: a
    terminal cost has no R curvature); its rows/cols return zero.
    """
    from .utils.linalg import inv_small

    n, m = cost.n, cost.m
    if isinstance(cost, DiagonalCost):
        Rpart = jnp.zeros((m,), cost.Qd.dtype) if terminal else 1.0 / cost.Rd
        return jnp.diag(jnp.concatenate([1.0 / cost.Qd, Rpart]))
    c = _as_dense(cost)
    dt = c.Q.dtype
    Qinv = inv_small(c.Q)
    if terminal:
        out = jnp.zeros((n + m, n + m), dt)
        return out.at[:n, :n].set(Qinv)
    if _concrete_all_zero(c.H):
        out = jnp.zeros((n + m, n + m), dt)
        out = out.at[:n, :n].set(Qinv)
        return out.at[n:, n:].set(inv_small(c.R))
    # Schur complement in Q: G^{-1} assembled blockwise
    HQinv = c.H @ Qinv                                   # (m, n)
    Sinv = inv_small(c.R - HQinv @ c.H.T)                # (m, m)
    TL = Qinv + HQinv.T @ Sinv @ HQinv
    TR = -HQinv.T @ Sinv
    return jnp.concatenate([
        jnp.concatenate([TL, TR], axis=1),
        jnp.concatenate([TR.T, Sinv], axis=1),
    ], axis=0)


def LQRCost(Q, R, xf, uf=None, diag: Optional[bool] = None, dtype=None):
    """Tracking cost 1/2 (x-xf)'Q(x-xf) + 1/2 (u-uf)'R(u-uf).

    Expanded form with q = -Q xf, r = -R uf, c = 1/2 xf'Q xf + 1/2 uf'R uf
    (cost_functions.jl:532-547). Returns a DiagonalCost when Q, R are
    vectors/diagonal, QuadraticCost otherwise.
    """
    Q = jnp.asarray(Q, dtype=dtype)
    R = jnp.asarray(R, dtype=dtype)
    xf = jnp.asarray(xf, Q.dtype)
    is_diag = (Q.ndim == 1 and R.ndim == 1) if diag is None else diag
    if uf is None:
        uf = jnp.zeros(R.shape[0], Q.dtype)
    else:
        uf = jnp.asarray(uf, Q.dtype)
    if is_diag:
        Qd = Q if Q.ndim == 1 else jnp.diag(Q)
        Rd = R if R.ndim == 1 else jnp.diag(R)
        q = -Qd * xf
        r = -Rd * uf
        c = 0.5 * jnp.sum(Qd * xf * xf) + 0.5 * jnp.sum(Rd * uf * uf)
        return DiagonalCost(Qd=Qd, Rd=Rd, q=q, r=r, c=c)
    Qm = jnp.diag(Q) if Q.ndim == 1 else Q
    Rm = jnp.diag(R) if R.ndim == 1 else R
    q = -Qm @ xf
    r = -Rm @ uf
    c = 0.5 * xf @ Qm @ xf + 0.5 * uf @ Rm @ uf
    return QuadraticCost.create(Qm, Rm, q=q, r=r, c=c)


def QuatLQRCost(Q, R, xf, uf=None, w=1.0, quat_ind=(3, 4, 5, 6), dtype=None):
    """Quaternion-tracking LQR cost (lie_costs.jl:133-142).

    1/2 (x-xf)'Q(x-xf) + 1/2 (u-uf)'R(u-uf) + w min(1 +- qf'q), with
    ``quat_ind`` the (0-based) quaternion slice of the state.
    """
    Qd = jnp.asarray(Q, dtype=dtype)
    Rd = jnp.asarray(R, dtype=dtype)
    if Qd.ndim == 2:
        Qd = jnp.diag(Qd)
    if Rd.ndim == 2:
        Rd = jnp.diag(Rd)
    xf = jnp.asarray(xf, Qd.dtype)
    if uf is None:
        uf = jnp.zeros(Rd.shape[0], Qd.dtype)
    else:
        uf = jnp.asarray(uf, Qd.dtype)
    q = -Qd * xf
    r = -Rd * uf
    c = 0.5 * jnp.sum(Qd * xf * xf) + 0.5 * jnp.sum(Rd * uf * uf)
    q_ref = xf[jnp.array(quat_ind)]
    return DiagonalQuatCost(
        Qd=Qd, Rd=Rd, q=q, r=r, c=c,
        w=jnp.asarray(w, Qd.dtype), q_ref=q_ref, q_ind=tuple(quat_ind),
    )


@struct.dataclass
class GenericCost:
    """User-defined nonlinear cost, autodiffed (the @autodiff user-cost path
    of the reference, test/nlcosts.jl:37-45).

    ``stage_fn(params, x, u) -> scalar`` and ``term_fn(params, x) -> scalar``
    are static pure callables; ``params`` is an arbitrary pytree (stackable
    along the knot axis for per-knot variation).  Expansion uses
    forward-over-reverse AD, the JAX analog of the reference's ForwardDiff
    default (src/TrajectoryOptimization.jl:22-23).
    """

    params: Any = None
    stage_fn: Any = struct.field(pytree_node=False, default=None)
    term_fn: Any = struct.field(pytree_node=False, default=None)
    n: int = struct.field(pytree_node=False, default=0)
    m: int = struct.field(pytree_node=False, default=0)

    def stage_cost(self, x, u):
        return self.stage_fn(self.params, x, u)

    def term_cost(self, x):
        if self.term_fn is not None:
            return self.term_fn(self.params, x)
        return self.stage_fn(self.params, x, jnp.zeros((self.m,), x.dtype))

    def expansion(self, x, u) -> CostExpansion:
        f = lambda x_, u_: self.stage_fn(self.params, x_, u_)
        gx = jax.grad(f, argnums=0)(x, u)
        gu = jax.grad(f, argnums=1)(x, u)
        xx = jax.jacfwd(jax.grad(f, argnums=0), argnums=0)(x, u)
        uu = jax.jacfwd(jax.grad(f, argnums=1), argnums=1)(x, u)
        ux = jax.jacfwd(jax.grad(f, argnums=1), argnums=0)(x, u)
        return CostExpansion(xx=xx, uu=uu, ux=ux, x=gx, u=gu, c=f(x, u))

    def term_expansion(self, x) -> CostExpansion:
        f = lambda x_: self.term_cost(x_)
        gx = jax.grad(f)(x)
        xx = jax.jacfwd(jax.grad(f))(x)
        m, n = self.m, x.shape[-1]
        return CostExpansion(
            xx=xx, uu=jnp.zeros((m, m), x.dtype), ux=jnp.zeros((m, n), x.dtype),
            x=gx, u=jnp.zeros((m,), x.dtype), c=f(x),
        )


@struct.dataclass
class ErrorQuadratic:
    """Error-state quadratic cost 1/2 (x (-) x_ref)' Q (x (-) x_ref)
    (lie_costs.jl:178-278): the quadratic acts on the TANGENT-space error
    computed by the model's ``state_diff`` (CayleyMap retraction,
    lie_costs.jl:238) — 12-dim error for a 13-dim quaternion state.

    The reference marks this cost as inferior to :class:`DiagonalQuatCost`
    (lie_costs.jl:211-213) but ships it; expansion is AD-based, matching the
    reference's ForwardAD default (lie_costs.jl:200).

    ``model`` must provide ``state_diff`` / ``errstate_dim``; ``Qd`` has the
    error-state dimension, R/r the control dimension.
    """

    Qd: jax.Array        # (errstate_dim [+ padded dims],)
    Rd: jax.Array        # (m,)
    r: jax.Array         # (m,)
    c: jax.Array         # scalar
    x_ref: jax.Array     # (n0,) — the model's native state dim
    model: Optional[object] = struct.field(pytree_node=False, default=None)
    nx: Optional[int] = struct.field(pytree_node=False, default=None)
    # Quaternion rows of the native state (lie_costs.jl:186 q_ind): drives
    # which Q row the ctor reduction drops (first) and which row quadratic
    # addition drops (last, lie_costs.jl:267-269 rm_quat).
    q_ind: Tuple[int, ...] = struct.field(pytree_node=False,
                                          default=(3, 4, 5, 6))

    @property
    def n(self) -> int:
        return self.nx if self.nx is not None else self.x_ref.shape[-1]

    @property
    def m(self) -> int:
        return self.Rd.shape[-1]

    @classmethod
    def create(cls, model, Q, R, x_ref, u_ref=None, r=None, c=0.0, dtype=None,
               q_ind=(3, 4, 5, 6)):
        Qd = jnp.asarray(Q, dtype=dtype)
        Rd = jnp.asarray(R, dtype=dtype)
        if Qd.ndim == 2:
            Qd = jnp.diag(Qd)
        if Rd.ndim == 2:
            Rd = jnp.diag(Rd)
        x_ref = jnp.asarray(x_ref, Qd.dtype)
        # Full-state-dim Q given for a quaternion state: drop the first
        # quaternion row to land in the errstate dim (lie_costs.jl:226-229).
        nerr = getattr(model, "errstate_dim", None)
        if (nerr is not None and Qd.shape[-1] == x_ref.shape[-1]
                and nerr == x_ref.shape[-1] - 1):
            Qd = jnp.delete(Qd, q_ind[0])
        m = Rd.shape[-1]
        r = jnp.zeros((m,), Qd.dtype) if r is None else jnp.asarray(r, Qd.dtype)
        c = jnp.asarray(c, Qd.dtype)
        if u_ref is not None:  # fold the control reference (lie_costs.jl:231-232)
            u_ref = jnp.asarray(u_ref, Qd.dtype)
            r = r - Rd * u_ref
            c = c + 0.5 * jnp.sum(Rd * u_ref * u_ref)
        return cls(Qd=Qd, Rd=Rd, r=r, c=c, x_ref=x_ref, model=model,
                   q_ind=tuple(int(i) for i in q_ind))

    def _err(self, x):
        # After change_dimension the state may carry appended quaternion-free
        # dims (lie_costs.jl:242-261): error = [state_diff(x0, x_ref); extra].
        n0 = self.x_ref.shape[-1]
        dx = self.model.state_diff(x[..., :n0], self.x_ref)
        if x.shape[-1] > n0:
            dx = jnp.concatenate([dx, x[..., n0:]], axis=-1)
        return dx

    def stage_cost(self, x, u):
        dx = self._err(x)
        J = 0.5 * jnp.sum(self.Qd * dx * dx) + self.c
        return J + 0.5 * jnp.sum(self.Rd * u * u) + self.r @ u

    def term_cost(self, x):
        dx = self._err(x)
        return 0.5 * jnp.sum(self.Qd * dx * dx) + self.c

    def expansion(self, x, u) -> CostExpansion:
        f = lambda x_: self.term_cost(x_)
        gx = jax.grad(f)(x)
        xx = jax.jacfwd(jax.grad(f))(x)
        n, m = x.shape[-1], self.m
        return CostExpansion(
            xx=xx, uu=jnp.diag(self.Rd), ux=jnp.zeros((m, n), x.dtype),
            x=gx, u=self.Rd * u + self.r, c=self.stage_cost(x, u),
        )

    def term_expansion(self, x) -> CostExpansion:
        f = lambda x_: self.term_cost(x_)
        gx = jax.grad(f)(x)
        xx = jax.jacfwd(jax.grad(f))(x)
        n, m = x.shape[-1], self.m
        return CostExpansion(
            xx=xx, uu=jnp.zeros((m, m), x.dtype), ux=jnp.zeros((m, n), x.dtype),
            x=gx, u=jnp.zeros((m,), x.dtype), c=f(x),
        )

    def __add__(self, other):
        """Fold a plain quadratic into the error-state cost
        (lie_costs.jl:263-278).  Requires H = 0 and q = 0 in the quadratic;
        a full-quaternion-state diagonal Q has its last quaternion row
        removed to land in the errstate dimension."""
        if isinstance(other, ErrorQuadratic):
            if other.n != self.n or other.m != self.m:
                raise ValueError("ErrorQuadratic addition: dims must match")
            models_match = other.model is self.model
            if not models_match:
                try:
                    models_match = bool(other.model == self.model)
                except Exception:
                    models_match = False
            if not models_match:
                raise ValueError(
                    "ErrorQuadratic + ErrorQuadratic requires the same model "
                    "(the sum is only a single error quadratic about one "
                    "reference; the reference library does not define it)")
            if not _concrete_all_zero(self.x_ref - other.x_ref):
                raise ValueError(
                    "ErrorQuadratic + ErrorQuadratic requires equal x_ref: "
                    "summing costs about different references is not an "
                    "ErrorQuadratic about either")
            return ErrorQuadratic(
                Qd=self.Qd + other.Qd, Rd=self.Rd + other.Rd,
                r=self.r + other.r, c=self.c + other.c,
                x_ref=self.x_ref, model=self.model, nx=self.nx,
                q_ind=self.q_ind)
        if not isinstance(other, (DiagonalCost, QuadraticCost)):
            return NotImplemented
        if other.m != self.m:
            raise ValueError("ErrorQuadratic addition: control dims must match")
        Q2 = jnp.diag(other.Q) if isinstance(other, QuadraticCost) else other.Qd
        R2 = jnp.diag(other.R) if isinstance(other, QuadraticCost) else other.Rd
        if isinstance(other, QuadraticCost) and not _concrete_all_zero(other.H):
            raise ValueError("ErrorQuadratic addition requires H = 0")
        if not _concrete_all_zero(other.q):
            raise ValueError("ErrorQuadratic addition requires q = 0")
        if other.n == self.Qd.shape[-1] + 1:
            # drop the last quaternion row (lie_costs.jl:267-269 rm_quat)
            Q2 = jnp.delete(Q2, self.q_ind[-1])
        elif other.n != self.Qd.shape[-1]:
            raise ValueError("ErrorQuadratic addition: state dims must match")
        return ErrorQuadratic(
            Qd=self.Qd + Q2, Rd=self.Rd + R2, r=self.r + other.r,
            c=self.c + other.c, x_ref=self.x_ref, model=self.model,
            nx=self.nx, q_ind=self.q_ind)

    __radd__ = __add__


def change_dimension(cost, n: int, m: int, ix=None, iu=None):
    """Embed a cost into a larger state/control space at indices ``ix``/``iu``
    (the reference's ``change_dimension``: cost_functions.jl:391,
    lie_costs.jl:144; used for augmented/multi-robot stacking).  New
    dimensions carry zero weight.
    """
    ix = tuple(range(cost.n)) if ix is None else tuple(int(i) for i in ix)
    iu = tuple(range(cost.m)) if iu is None else tuple(int(i) for i in iu)
    if len(ix) != cost.n or len(iu) != cost.m:
        raise ValueError("index sets must match the cost's current dims")
    jx, ju = jnp.array(ix), jnp.array(iu)

    if isinstance(cost, DiagonalCost):
        return DiagonalCost(
            Qd=jnp.zeros(n, cost.Qd.dtype).at[jx].set(cost.Qd),
            Rd=jnp.zeros(m, cost.Rd.dtype).at[ju].set(cost.Rd) if m else cost.Rd[:0],
            q=jnp.zeros(n, cost.q.dtype).at[jx].set(cost.q),
            r=jnp.zeros(m, cost.r.dtype).at[ju].set(cost.r) if m else cost.r[:0],
            c=cost.c,
        )
    if isinstance(cost, QuadraticCost):
        Q = jnp.zeros((n, n), cost.Q.dtype).at[jnp.ix_(jx, jx)].set(cost.Q)
        R = jnp.zeros((m, m), cost.R.dtype)
        H = jnp.zeros((m, n), cost.H.dtype)
        if m:
            R = R.at[jnp.ix_(ju, ju)].set(cost.R)
            H = H.at[jnp.ix_(ju, jx)].set(cost.H)
        return QuadraticCost(
            Q=Q, R=R, H=H,
            q=jnp.zeros(n, cost.q.dtype).at[jx].set(cost.q),
            r=jnp.zeros(m, cost.r.dtype).at[ju].set(cost.r) if m else cost.r[:0],
            c=cost.c,
        )
    if isinstance(cost, DiagonalQuatCost):
        # remap the quaternion indices through ix (lie_costs.jl:144-156)
        q_ind = tuple(ix[i] for i in cost.q_ind)
        return DiagonalQuatCost(
            Qd=jnp.zeros(n, cost.Qd.dtype).at[jx].set(cost.Qd),
            Rd=jnp.zeros(m, cost.Rd.dtype).at[ju].set(cost.Rd) if m else cost.Rd[:0],
            q=jnp.zeros(n, cost.q.dtype).at[jx].set(cost.q),
            r=jnp.zeros(m, cost.r.dtype).at[ju].set(cost.r) if m else cost.r[:0],
            c=cost.c, w=cost.w, q_ref=cost.q_ref, q_ind=q_ind,
        )
    if isinstance(cost, ErrorQuadratic):
        # lie_costs.jl:242-261: zero-pad the NEW trailing dims (the added
        # states are assumed quaternion-free), keep the error-state block.
        # Only the default leading-block embedding is defined — the
        # reference's ErrorQuadratic change_dimension has no ix/iu form
        # either (lie_costs.jl:242), and silently ignoring the indices
        # would mis-place the cost.
        if ix != tuple(range(cost.n)) or iu != tuple(range(cost.m)):
            raise ValueError(
                "change_dimension(ErrorQuadratic): only the leading-block "
                "embedding (default ix/iu) is supported")
        n0 = cost.n
        nerr = cost.Qd.shape[-1]
        dn, dm = n - n0, m - cost.m
        if dn < 0 or dm < 0:
            raise ValueError("change_dimension: can only grow dims")
        return ErrorQuadratic(
            Qd=jnp.concatenate([cost.Qd, jnp.zeros(dn, cost.Qd.dtype)]),
            Rd=jnp.concatenate([cost.Rd, jnp.zeros(dm, cost.Rd.dtype)]),
            r=jnp.concatenate([cost.r, jnp.zeros(dm, cost.r.dtype)]),
            c=cost.c, x_ref=cost.x_ref, model=cost.model, nx=n)
    raise TypeError(f"change_dimension: unsupported cost type {type(cost).__name__}")
