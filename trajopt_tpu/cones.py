"""Convex cones: membership, projections, and projection derivatives.

TPU-native re-design of the reference's conic-set layer
(/root/reference/src/cones.jl:17-291).  The reference dispatches on Julia
singleton types (``ZeroCone``, ``NegativeOrthant``, ``SecondOrderCone``) with
hand-unrolled, allocation-free loops; here each cone is a static enum tag and
every operation is a branchless, vmappable closed form built from
``jnp.where`` masks, so a batch of (B, N, p) cone ops compiles to a single
fused XLA kernel.

Conventions (matching the reference):
  * ``SecondOrderCone`` vectors are stacked ``[v; s]`` with the scalar last
    (cones.jl:53-61).
  * ``dualcone``: zero <-> identity (free), orthants and SOC are self-dual
    (cones.jl:65-69).
  * ``projection_jacobian`` is the Jacobian of ``x -> projection(x)``
    (cones.jl:129-188); ``projection_hessian(x, b)`` is the Hessian of
    ``x -> projection(x) @ b`` (cones.jl:201-276).
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

__all__ = [
    "Cone",
    "ZeroCone",
    "Equality",
    "NegativeOrthant",
    "Inequality",
    "PositiveOrthant",
    "IdentityCone",
    "SecondOrderCone",
    "dualcone",
    "projection",
    "projection_jacobian",
    "projection_hessian",
    "in_cone",
    "cone_status",
    "violation",
]


class Cone(enum.Enum):
    """Static cone tag (trace-time constant, like the reference's type tags)."""

    IDENTITY = "identity"
    ZERO = "zero"
    NEGATIVE_ORTHANT = "negative_orthant"
    POSITIVE_ORTHANT = "positive_orthant"
    SECOND_ORDER = "second_order"


# Reference-parity aliases (cones.jl:34,48).
IdentityCone = Cone.IDENTITY
ZeroCone = Cone.ZERO
Equality = Cone.ZERO
NegativeOrthant = Cone.NEGATIVE_ORTHANT
Inequality = Cone.NEGATIVE_ORTHANT
PositiveOrthant = Cone.POSITIVE_ORTHANT
SecondOrderCone = Cone.SECOND_ORDER


def dualcone(cone: Cone) -> Cone:
    """Dual cone (cones.jl:65-69)."""
    return {
        Cone.IDENTITY: Cone.ZERO,
        Cone.ZERO: Cone.IDENTITY,
        Cone.NEGATIVE_ORTHANT: Cone.NEGATIVE_ORTHANT,
        Cone.POSITIVE_ORTHANT: Cone.POSITIVE_ORTHANT,
        Cone.SECOND_ORDER: Cone.SECOND_ORDER,
    }[cone]


def _soc_split(x):
    v = x[:-1]
    s = x[-1]
    a = jnp.linalg.norm(v)
    return v, s, a


def _safe_div(num, den):
    """num/den with den==0 guarded (the guarded branch is always masked out)."""
    safe = jnp.where(den == 0, 1.0, den)
    return num / safe


def projection(cone: Cone, x: jax.Array) -> jax.Array:
    """Euclidean projection of ``x`` onto the cone (cones.jl:71-94)."""
    if cone is Cone.IDENTITY:
        return x
    if cone is Cone.ZERO:
        return jnp.zeros_like(x)
    if cone is Cone.NEGATIVE_ORTHANT:
        return jnp.minimum(0, x)
    if cone is Cone.POSITIVE_ORTHANT:
        return jnp.maximum(0, x)
    if cone is Cone.SECOND_ORDER:
        v, s, a = _soc_split(x)
        below = a <= -s  # -> 0
        inside = a <= s  # -> x
        coef = 0.5 * (1 + _safe_div(s, a))
        outside_val = coef * jnp.concatenate([v, a[None]])
        return jnp.where(below, 0.0, jnp.where(inside, x, outside_val))
    raise ValueError(f"unknown cone {cone}")


def projection_jacobian(cone: Cone, x: jax.Array) -> jax.Array:
    """Jacobian of the cone projection, (p, p) (cones.jl:129-188)."""
    p = x.shape[-1]
    eye = jnp.eye(p, dtype=x.dtype)
    if cone is Cone.IDENTITY:
        return eye
    if cone is Cone.ZERO:
        return jnp.zeros((p, p), dtype=x.dtype)
    if cone is Cone.NEGATIVE_ORTHANT:
        return jnp.diag(jnp.where(x <= 0, 1.0, 0.0).astype(x.dtype))
    if cone is Cone.POSITIVE_ORTHANT:
        return jnp.diag(jnp.where(x >= 0, 1.0, 0.0).astype(x.dtype))
    if cone is Cone.SECOND_ORDER:
        v, s, a = _soc_split(x)
        below = a <= -s
        inside = a <= s
        # Outside-cone closed form (cones.jl:161-182).
        c = 0.5 * (1 + _safe_div(s, a))
        a3 = _safe_div(1.0, a * a * a)
        n1 = p - 1
        dvdv = (-0.5 * s * a3) * jnp.outer(v, v) + c * jnp.eye(n1, dtype=x.dtype)
        dvds = 0.5 * _safe_div(v, a)
        dsdv = (-0.5 * s * _safe_div(1.0, a * a) + _safe_div(c, a)) * v
        top = jnp.concatenate([dvdv, dvds[:, None]], axis=1)
        bot = jnp.concatenate([dsdv, jnp.array([0.5], dtype=x.dtype)])[None, :]
        outside_jac = jnp.concatenate([top, bot], axis=0)
        return jnp.where(below, 0.0, jnp.where(inside, eye, outside_jac))
    raise ValueError(f"unknown cone {cone}")


def projection_hessian(cone: Cone, x: jax.Array, b: jax.Array) -> jax.Array:
    """Hessian of ``x -> projection(x) @ b``, shape (p, p) (cones.jl:201-276).

    Used by full-Newton / projected-Newton phases for the second-order
    constraint expansion.
    """
    p = x.shape[-1]
    zero = jnp.zeros((p, p), dtype=x.dtype)
    if cone in (Cone.IDENTITY, Cone.ZERO, Cone.NEGATIVE_ORTHANT, Cone.POSITIVE_ORTHANT):
        return zero
    if cone is Cone.SECOND_ORDER:
        v, s, a = _soc_split(x)
        bv = b[:-1]
        bs = b[-1]
        n1 = p - 1
        below = a <= -s
        inside = a <= s
        a2 = _safe_div(1.0, a * a)
        vbv = jnp.dot(v, bv)
        # h = (I - vv'/a^2) bv  (cones.jl:244-252)
        h = bv - v * (vbv * a2)
        dvds = 0.5 * _safe_div(h, a)
        # Lower-triangle formula (cones.jl:256-268), then symmetrized, which
        # is exact because the true Hessian is symmetric.
        H1 = jnp.outer(h, v) * (-s * a2 * _safe_div(1.0, a))
        H2 = (
            jnp.outer(v, v) * (2.0 * vbv * a2 * a2)
            - jnp.outer(v, bv) * a2
            - jnp.eye(n1, dtype=x.dtype) * (vbv * a2)
        ) * _safe_div(s, a)
        H3 = (jnp.eye(n1, dtype=x.dtype) - jnp.outer(v, v) * a2) * _safe_div(bs, a)
        M = (H1 + H2 + H3) * 0.5
        dvdv = jnp.tril(M) + jnp.tril(M, -1).T
        top = jnp.concatenate([dvdv, dvds[:, None]], axis=1)
        bot = jnp.concatenate([dvds, jnp.zeros((1,), dtype=x.dtype)])[None, :]
        outside_hess = jnp.concatenate([top, bot], axis=0)
        return jnp.where(below | inside, zero, outside_hess)
    raise ValueError(f"unknown cone {cone}")


def in_cone(cone: Cone, x: jax.Array, tol: float = 0.0):
    """Boolean cone membership (cones.jl:190-199)."""
    if cone is Cone.IDENTITY:
        return jnp.array(True)
    if cone is Cone.ZERO:
        return jnp.max(jnp.abs(x)) <= tol
    if cone is Cone.NEGATIVE_ORTHANT:
        return jnp.max(x) <= tol
    if cone is Cone.POSITIVE_ORTHANT:
        return jnp.min(x) >= -tol
    if cone is Cone.SECOND_ORDER:
        v, s, a = _soc_split(x)
        return a <= s + tol
    raise ValueError(f"unknown cone {cone}")


def violation(cone: Cone, x: jax.Array) -> jax.Array:
    """Scalar infinity-norm distance-like violation used for ``max_violation``.

    For orthants/zero this is the elementwise violation max; for SOC it is
    ``||x - projection(x)||_inf`` (how Altro.jl measures conic feasibility).
    """
    if cone is Cone.ZERO:
        return jnp.max(jnp.abs(x), initial=0.0)
    if cone is Cone.NEGATIVE_ORTHANT:
        return jnp.max(x, initial=0.0)
    if cone is Cone.POSITIVE_ORTHANT:
        return jnp.max(-x, initial=0.0)
    if cone in (Cone.IDENTITY,):
        return jnp.zeros(())
    if cone is Cone.SECOND_ORDER:
        return jnp.max(jnp.abs(x - projection(cone, x)), initial=0.0)
    raise ValueError(f"unknown cone {cone}")


def cone_status(cone: Cone, x) -> str:
    """SOC regime label (cones.jl:278-291): ``"below"`` (in the polar cone,
    projection is 0), ``"in"`` (projection is identity), or ``"outside"``
    (the ray-scaling branch).  Host-side diagnostic on concrete values —
    the reference returns Symbols; traced code should branch on
    :func:`in_cone` / :func:`projection` instead.
    """
    import numpy as np

    if cone is not Cone.SECOND_ORDER:
        return "in" if bool(np.asarray(in_cone(cone, jnp.asarray(x)))) \
            else "outside"
    arr = np.asarray(x)
    s, a = arr[-1], float(np.linalg.norm(arr[:-1]))
    if a <= -s:
        return "below"
    if a <= s:
        return "in"
    if a > abs(s):
        return "outside"
    return "invalid"
