"""Constraint library.

TPU-native re-design of /root/reference/src/constraints.jl and
src/abstract_constraint.jl.  Each constraint is a frozen pytree dataclass:
array data (goal states, obstacle centers, bounds) are leaves — so batched
problems can vmap over them — while index sets and dimensions are static
fields, mirroring the reference's type-level parameters.

Protocol (abstract_constraint.jl:82-149):
  * ``evaluate(x, u) -> (p,)`` — constraint value at one knot
  * ``jacobian(x, u) -> (p, n+m)`` — analytic where the reference has
    ``UserDefined`` rules; ``jax.jacfwd`` fallback elsewhere (the ForwardAD
    default)
  * ``sense`` — the cone the value must lie in
  * ``kind`` — "state" / "control" / "stage", mapping to the reference's
    StateConstraint / ControlConstraint / StageConstraint input traits
  * bounds queries for direct (NLP) solvers (abstract_constraint.jl:107-139)
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .cones import Cone, violation as cone_violation

__all__ = [
    "AbstractConstraint",
    "GoalConstraint",
    "LinearConstraint",
    "CircleConstraint",
    "SphereConstraint",
    "CollisionConstraint",
    "NormConstraint",
    "BoundConstraint",
    "StateBound",
    "ControlBound",
    "IndexedConstraint",
    "QuatVecEq",
    "sense",
    "is_bound",
    "full_width_jacobian",
]

_NEG_INF = -np.inf
_POS_INF = np.inf


class AbstractConstraint:
    """Mixin providing defaults for the constraint protocol.

    ``sense``/``kind`` are deliberately UN-annotated class attributes so they
    never become dataclass fields in subclasses (subclasses either override
    the class attribute or declare their own static field).
    """

    sense = Cone.NEGATIVE_ORTHANT
    kind = "stage"  # "state" | "control" | "stage"

    @property
    def output_dim(self) -> int:
        raise NotImplementedError

    def evaluate(self, x: jax.Array, u: jax.Array) -> jax.Array:
        raise NotImplementedError

    def jacobian(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """(p, n+m) Jacobian wrt z = [x; u]; jacfwd default (ForwardAD)."""
        Jx = jax.jacfwd(self.evaluate, argnums=0)(x, u)
        Ju = jax.jacfwd(self.evaluate, argnums=1)(x, u)
        return jnp.concatenate([Jx, Ju], axis=-1)

    def jacobian_fd(self, x: jax.Array, u: jax.Array, eps: float = None) -> jax.Array:
        """Central finite-difference Jacobian — the reference's
        ``DiffMethod = FiniteDifference`` (src/TrajectoryOptimization.jl:23;
        selected per constraint at constraint_list.jl:103-106, and used as a
        second derivative oracle in constraint_tests.jl:437-444).

        Vectorized: one vmap over the n+m perturbation basis (2 batched
        evaluations total), so it stays a fixed-shape TPU kernel like the
        AD path.  Central differences, eps ~ cbrt(machine eps) by default.
        """
        n, m = x.shape[-1], u.shape[-1]
        dtype = x.dtype
        if eps is None:
            eps = float(np.cbrt(np.finfo(np.dtype(x.dtype)).eps))
        dx = jnp.concatenate([jnp.eye(n, dtype=dtype),
                              jnp.zeros((m, n), dtype)], axis=0)
        du = jnp.concatenate([jnp.zeros((n, m), dtype),
                              jnp.eye(m, dtype=dtype)], axis=0)

        def col(dxi, dui):
            hi = self.evaluate(x + eps * dxi, u + eps * dui)
            lo = self.evaluate(x - eps * dxi, u - eps * dui)
            return (hi - lo) / (2.0 * eps)

        return jax.vmap(col)(dx, du).T  # (p, n+m)

    def violation(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return cone_violation(self.sense, self.evaluate(x, u))

    def con_label(self, i: int) -> str:
        """Human-readable label for output row ``i`` (0-based), for solver
        summaries (abstract_constraint.jl:151)."""
        if not 0 <= i < self.output_dim:
            raise IndexError(f"constraint row {i} out of range")
        return f"index {i}"

    # -- bound queries for direct solvers (abstract_constraint.jl:107-139) ----
    @property
    def is_bound(self) -> bool:
        return False

    def lower_bound(self):
        p = self.output_dim
        if self.sense is Cone.ZERO:
            return np.zeros(p)
        if self.sense is Cone.NEGATIVE_ORTHANT:
            return np.full(p, _NEG_INF)
        return np.full(p, _NEG_INF)

    def upper_bound(self):
        p = self.output_dim
        if self.sense is Cone.ZERO:
            return np.zeros(p)
        if self.sense is Cone.NEGATIVE_ORTHANT:
            return np.zeros(p)
        return np.full(p, _POS_INF)


def sense(con: AbstractConstraint) -> Cone:
    return con.sense


def is_bound(con: AbstractConstraint) -> bool:
    return con.is_bound


def full_width_jacobian(con: AbstractConstraint, x, u):
    """``con.jacobian`` padded to the full stage width ``(p, n+m)``.

    The reference's StateConstraint/ControlConstraint Jacobians are narrow —
    ``(p, n)`` / ``(p, m)`` (abstract_constraint.jl:82-94 input traits) — and
    constraints here built without an explicit ``m=``/``n=`` embed produce the
    same narrow forms.  Solver consumers that assemble whole-stage expansions
    (AL expansion, projected Newton, NLP Jacobian rows) need the full width;
    shapes are static, so the branch resolves at trace time and the zero pad
    fuses away.
    """
    J = con.jacobian(x, u)
    n, m = x.shape[-1], u.shape[-1]
    w = J.shape[-1]
    if w == n + m:
        return J
    zeros = lambda c: jnp.zeros(J.shape[:-1] + (c,), J.dtype)
    if getattr(con, "kind", "stage") == "control" and w == m:
        return jnp.concatenate([zeros(n), J], axis=-1)
    if w == n:
        return jnp.concatenate([J, zeros(m)], axis=-1)
    raise ValueError(
        f"constraint jacobian width {w} matches neither n={n}, m={m}, nor n+m")


# ---------------------------------------------------------------------------


@struct.dataclass
class GoalConstraint(AbstractConstraint):
    """x[inds] == xf equality (constraints.jl:22-87)."""

    xf: jax.Array  # (p,) — goal values at `inds`
    inds: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)

    sense = Cone.ZERO
    kind = "state"

    @classmethod
    def create(cls, xf, inds=None, m: int = 0):
        xf = jnp.asarray(xf)
        n = xf.shape[-1]
        if inds is None:
            inds = tuple(range(n))
        inds = tuple(int(i) for i in inds)
        return cls(xf=xf[jnp.array(inds)], inds=inds, n=n, m=m)

    @property
    def output_dim(self) -> int:
        return len(self.inds)

    def evaluate(self, x, u):
        return x[np.asarray(self.inds)] - self.xf

    def jacobian(self, x, u):  # analytic identity rows (constraints.jl:62-68)
        p = self.output_dim
        J = jnp.zeros((p, self.n + self.m), x.dtype)
        return J.at[jnp.arange(p), np.asarray(self.inds)].set(1.0)

    @property
    def is_bound(self) -> bool:
        return True

    def set_goal_state(self, xf) -> "GoalConstraint":
        """MPC retarget (constraints.jl:79-87); returns a new constraint."""
        xf = jnp.asarray(xf)
        if xf.shape[-1] == self.n:
            xf = xf[np.asarray(self.inds)]
        return self.replace(xf=xf)


@struct.dataclass
class LinearConstraint(AbstractConstraint):
    """A @ z[inds] - b in any cone (constraints.jl:103-150)."""

    A: jax.Array  # (p, w)
    b: jax.Array  # (p,)
    sense: Cone = struct.field(pytree_node=False)
    inds: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)

    kind = "stage"

    @classmethod
    def create(cls, n, m, A, b, sense: Cone = Cone.NEGATIVE_ORTHANT, inds=None):
        A = jnp.asarray(A)
        b = jnp.asarray(b)
        if inds is None:
            inds = tuple(range(n + m))
        inds = tuple(int(i) for i in inds)
        assert A.shape == (b.shape[-1], len(inds))
        return cls(A=A, b=b, sense=sense, inds=inds, n=n, m=m)

    @property
    def output_dim(self) -> int:
        return self.b.shape[-1]

    def evaluate(self, x, u):
        z = jnp.concatenate([x, u])[np.asarray(self.inds)]
        return self.A @ z - self.b

    def jacobian(self, x, u):  # analytic (constraints.jl:141-144)
        J = jnp.zeros((self.output_dim, self.n + self.m), self.A.dtype)
        return J.at[:, np.asarray(self.inds)].set(self.A)


@struct.dataclass
class CircleConstraint(AbstractConstraint):
    """P circular obstacles: r^2 - (x-xc)^2 - (y-yc)^2 <= 0
    (constraints.jl:168-233)."""

    xc: jax.Array  # (P,)
    yc: jax.Array  # (P,)
    radius: jax.Array  # (P,)
    xi: int = struct.field(pytree_node=False, default=0)
    yi: int = struct.field(pytree_node=False, default=1)
    n: int = struct.field(pytree_node=False, default=0)
    m: int = struct.field(pytree_node=False, default=0)

    sense = Cone.NEGATIVE_ORTHANT
    kind = "state"

    @classmethod
    def create(cls, n, xc, yc, radius, xi=0, yi=1, m=0):
        return cls(xc=jnp.asarray(xc), yc=jnp.asarray(yc), radius=jnp.asarray(radius),
                   xi=xi, yi=yi, n=n, m=m)

    @property
    def output_dim(self) -> int:
        return self.xc.shape[-1]

    def evaluate(self, x, u):
        dx = x[self.xi] - self.xc
        dy = x[self.yi] - self.yc
        return self.radius ** 2 - dx ** 2 - dy ** 2

    def jacobian(self, x, u):  # analytic (constraints.jl:211-226)
        dx = x[self.xi] - self.xc
        dy = x[self.yi] - self.yc
        J = jnp.zeros((self.output_dim, self.n + self.m), x.dtype)
        J = J.at[:, self.xi].set(-2 * dx)
        J = J.at[:, self.yi].set(-2 * dy)
        return J


@struct.dataclass
class SphereConstraint(AbstractConstraint):
    """P spherical obstacles in 3-D (constraints.jl:249-326)."""

    xc: jax.Array
    yc: jax.Array
    zc: jax.Array
    radius: jax.Array
    xi: int = struct.field(pytree_node=False, default=0)
    yi: int = struct.field(pytree_node=False, default=1)
    zi: int = struct.field(pytree_node=False, default=2)
    n: int = struct.field(pytree_node=False, default=0)
    m: int = struct.field(pytree_node=False, default=0)

    sense = Cone.NEGATIVE_ORTHANT
    kind = "state"

    @classmethod
    def create(cls, n, xc, yc, zc, radius, xi=0, yi=1, zi=2, m=0):
        return cls(xc=jnp.asarray(xc), yc=jnp.asarray(yc), zc=jnp.asarray(zc),
                   radius=jnp.asarray(radius), xi=xi, yi=yi, zi=zi, n=n, m=m)

    @property
    def output_dim(self) -> int:
        return self.xc.shape[-1]

    def evaluate(self, x, u):
        dx = x[self.xi] - self.xc
        dy = x[self.yi] - self.yc
        dz = x[self.zi] - self.zc
        return self.radius ** 2 - dx ** 2 - dy ** 2 - dz ** 2

    def jacobian(self, x, u):
        dx = x[self.xi] - self.xc
        dy = x[self.yi] - self.yc
        dz = x[self.zi] - self.zc
        J = jnp.zeros((self.output_dim, self.n + self.m), x.dtype)
        J = J.at[:, self.xi].set(-2 * dx)
        J = J.at[:, self.yi].set(-2 * dy)
        J = J.at[:, self.zi].set(-2 * dz)
        return J


@struct.dataclass
class CollisionConstraint(AbstractConstraint):
    """Pairwise body separation: r^2 - ||x[i1] - x[i2]||^2 <= 0
    (constraints.jl:343-393)."""

    radius: jax.Array  # scalar
    i1: Tuple[int, ...] = struct.field(pytree_node=False)
    i2: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)

    sense = Cone.NEGATIVE_ORTHANT
    kind = "state"

    @classmethod
    def create(cls, n, i1, i2, radius, m=0):
        i1 = tuple(int(i) for i in i1)
        i2 = tuple(int(i) for i in i2)
        assert len(i1) == len(i2)
        return cls(radius=jnp.asarray(radius), i1=i1, i2=i2, n=n, m=m)

    @property
    def output_dim(self) -> int:
        return 1

    def evaluate(self, x, u):
        d = x[np.asarray(self.i1)] - x[np.asarray(self.i2)]
        return (self.radius ** 2 - d @ d)[None]

    def jacobian(self, x, u):  # analytic (constraints.jl:378-390)
        d = x[np.asarray(self.i1)] - x[np.asarray(self.i2)]
        J = jnp.zeros((1, self.n + self.m), x.dtype)
        J = J.at[0, np.asarray(self.i1)].set(-2 * d)
        J = J.at[0, np.asarray(self.i2)].set(2 * d)
        return J


@struct.dataclass
class NormConstraint(AbstractConstraint):
    """||z[inds]|| vs val (constraints.jl:438-521).

    * Inequality / Equality: scalar z'z - val^2 (constraints.jl:462-475)
    * SecondOrderCone: emits [z[inds]; val], dim D+1 with identity-row
      Jacobian — the SOCP entry point (constraints.jl:477-517)
    """

    val: jax.Array  # scalar
    sense: Cone = struct.field(pytree_node=False)
    inds: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)

    kind = "stage"

    @classmethod
    def create(cls, n, m, val, sense: Cone = Cone.NEGATIVE_ORTHANT, inds="control"):
        if inds == "state":
            inds = tuple(range(n))
        elif inds == "control":
            inds = tuple(range(n, n + m))
        else:
            inds = tuple(int(i) for i in inds)
        return cls(val=jnp.asarray(val), sense=sense, inds=inds, n=n, m=m)

    @property
    def output_dim(self) -> int:
        if self.sense is Cone.SECOND_ORDER:
            return len(self.inds) + 1
        return 1

    @property
    def kind(self) -> str:  # noqa: F811 — property shadows class attr
        if all(i >= self.n for i in self.inds):
            return "control"
        if all(i < self.n for i in self.inds):
            return "state"
        return "stage"

    def evaluate(self, x, u):
        z = jnp.concatenate([x, u])[np.asarray(self.inds)]
        if self.sense is Cone.SECOND_ORDER:
            return jnp.concatenate([z, self.val[None]])
        return (z @ z - self.val ** 2)[None]

    def jacobian(self, x, u):
        z = jnp.concatenate([x, u])
        if self.sense is Cone.SECOND_ORDER:
            p = self.output_dim
            J = jnp.zeros((p, self.n + self.m), x.dtype)
            return J.at[jnp.arange(p - 1), np.asarray(self.inds)].set(1.0)
        J = jnp.zeros((1, self.n + self.m), x.dtype)
        return J.at[0, np.asarray(self.inds)].set(2 * z[np.asarray(self.inds)])


def _finite_inds(v) -> Tuple[int, ...]:
    return tuple(int(i) for i in np.where(np.isfinite(np.asarray(v, dtype=float)))[0])


def _expand_bound(val, size, default):
    if val is None:
        return np.full(size, default, dtype=float)
    val = np.asarray(val, dtype=float)
    if val.ndim == 0:
        return np.full(size, float(val))
    assert val.shape == (size,)
    return val


@struct.dataclass
class BoundConstraint(AbstractConstraint):
    """Joint box bounds on states and controls (constraints.jl:644-783).

    Output layout matches the reference: finite upper rows (z - z_max) first,
    then finite lower rows (z_min - z); the finite-index sets are static
    (computed host-side at construction, like the reference's
    ``findall(isfinite, ...)``).
    """

    z_min: jax.Array  # (n+m,) with -inf where unbounded
    z_max: jax.Array  # (n+m,)
    i_max: Tuple[int, ...] = struct.field(pytree_node=False)
    i_min: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)
    kind: str = struct.field(pytree_node=False, default="stage")

    sense = Cone.NEGATIVE_ORTHANT

    @classmethod
    def create(cls, n, m, x_min=None, x_max=None, u_min=None, u_max=None, kind="stage"):
        x_min = _expand_bound(x_min, n, _NEG_INF)
        x_max = _expand_bound(x_max, n, _POS_INF)
        u_min = _expand_bound(u_min, m, _NEG_INF)
        u_max = _expand_bound(u_max, m, _POS_INF)
        if not (np.all(x_max >= x_min) and np.all(u_max >= u_min)):
            raise ValueError("Upper bounds must be >= lower bounds")  # checkBounds
        z_min = np.concatenate([x_min, u_min])
        z_max = np.concatenate([x_max, u_max])
        return cls(z_min=jnp.asarray(z_min), z_max=jnp.asarray(z_max),
                   i_max=_finite_inds(z_max), i_min=_finite_inds(z_min), n=n, m=m,
                   kind=kind)

    @property
    def output_dim(self) -> int:
        return len(self.i_max) + len(self.i_min)

    def evaluate(self, x, u):
        z = jnp.concatenate([x, u])

        def take(a, inds):
            # Static slice when the finite-index set is contiguous (e.g.
            # control-only bounds): XLA gathers with index arrays are slow
            # on TPU even for constant indices.
            if list(inds) == list(range(inds[0], inds[-1] + 1)):
                return a[inds[0]:inds[-1] + 1]
            return a[np.asarray(inds, dtype=int)]

        upper = take(z, self.i_max) - take(self.z_max, self.i_max) \
            if self.i_max else jnp.zeros((0,), z.dtype)
        lower = take(self.z_min, self.i_min) - take(z, self.i_min) \
            if self.i_min else jnp.zeros((0,), z.dtype)
        return jnp.concatenate([upper, lower]) if self.output_dim else jnp.zeros((0,), z.dtype)

    def jacobian(self, x, u):  # analytic +-1 rows (constraints.jl:758-765)
        J = jnp.zeros((self.output_dim, self.n + self.m), x.dtype)
        nu = len(self.i_max)
        if nu:
            J = J.at[jnp.arange(nu), np.asarray(self.i_max)].set(1.0)
        nl = len(self.i_min)
        if nl:
            J = J.at[nu + jnp.arange(nl), np.asarray(self.i_min)].set(-1.0)
        return J

    @property
    def is_bound(self) -> bool:
        return True

    def lower_bound(self):
        return np.asarray(self.z_min)

    def upper_bound(self):
        return np.asarray(self.z_max)

    def con_label(self, i: int) -> str:
        """Row label: upper rows first, then lower, over the compressed
        finite-index sets (constraints.jl:689-706; 0-based here)."""
        nu = len(self.i_max)
        if 0 <= i < nu:
            z = self.i_max[i]
            kind = "max"
        elif nu <= i < self.output_dim:
            z = self.i_min[i - nu]
            kind = "min"
        else:
            raise IndexError(f"constraint row {i} out of range")
        if z < self.n:
            return f"x {kind} {z}"
        return f"u {kind} {z - self.n}"


def StateBound(n, m, x_min=None, x_max=None) -> BoundConstraint:
    """State-only box bound (constraints.jl:528-595)."""
    return BoundConstraint.create(n, m, x_min=x_min, x_max=x_max, kind="state")


def ControlBound(n, m, u_min=None, u_max=None) -> BoundConstraint:
    """Control-only box bound (constraints.jl:597-631)."""
    return BoundConstraint.create(n, m, u_min=u_min, u_max=u_max, kind="control")


@struct.dataclass
class IndexedConstraint(AbstractConstraint):
    """Re-index a constraint into a larger augmented state/control — e.g.
    multi-robot stacking (constraints.jl:820-936)."""

    con: Any
    ix: Tuple[int, ...] = struct.field(pytree_node=False)
    iu: Tuple[int, ...] = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, n, m, con, ix=None, iu=None):
        n0 = getattr(con, "n", n)
        m0 = getattr(con, "m", m)
        ix = tuple(range(n0)) if ix is None else tuple(int(i) for i in ix)
        iu = tuple(range(m0)) if iu is None else tuple(int(i) for i in iu)
        return cls(con=con, ix=ix, iu=iu, n=n, m=m)

    @property
    def sense(self) -> Cone:  # noqa: F811
        return self.con.sense

    @property
    def kind(self) -> str:  # noqa: F811
        return self.con.kind

    @property
    def output_dim(self) -> int:
        return self.con.output_dim

    def evaluate(self, x, u):
        return self.con.evaluate(x[np.asarray(self.ix)], u[np.asarray(self.iu)])

    def jacobian(self, x, u):  # Jacobian scatter (constraints.jl:900-928)
        J0 = full_width_jacobian(self.con, x[np.asarray(self.ix)],
                                 u[np.asarray(self.iu)])
        n0 = len(self.ix)
        J = jnp.zeros((self.output_dim, self.n + self.m), J0.dtype)
        J = J.at[:, np.asarray(self.ix)].set(J0[:, :n0])
        J = J.at[:, self.n + np.asarray(self.iu)].set(J0[:, n0:])
        return J

    @property
    def is_bound(self) -> bool:
        return self.con.is_bound


@struct.dataclass
class QuatVecEq(AbstractConstraint):
    """Quaternion goal equality on the vector part, sign-corrected
    (constraints.jl:938-965): c = -(sgn(qf'q) qf - q)[1:3] with q normalized."""

    qf: jax.Array  # (4,) reference quaternion, scalar-first
    q_ind: Tuple[int, int, int, int] = struct.field(pytree_node=False, default=(3, 4, 5, 6))
    n: int = struct.field(pytree_node=False, default=13)
    m: int = struct.field(pytree_node=False, default=4)

    sense = Cone.ZERO
    kind = "state"

    @property
    def output_dim(self) -> int:
        return 3

    def evaluate(self, x, u):
        q = x[jnp.array(self.q_ind)]
        q = q / jnp.linalg.norm(q)
        dq = self.qf @ q
        qf = jnp.where(dq < 0, -self.qf, self.qf)
        return -(qf[1:] - q[1:])


def constraint_hessian(con: AbstractConstraint, x, u, lam):
    """Hessian of lam' c(x, u) wrt z = [x; u] — the second-order constraint
    term of full-Newton methods (the reference's ∇constraint_jacobians!,
    abstract_constraint.jl:267-280, which ADDS lam' nabla^2 c into G).

    AD default (forward-over-reverse); linear constraints short-circuit to
    zero (the reference's ∇jacobian! = 0 overrides for Goal/Linear/Bound).
    """
    if isinstance(con, (GoalConstraint, LinearConstraint, BoundConstraint)):
        nm = con.n + con.m
        return jnp.zeros((nm, nm), x.dtype)

    def lam_c(xu):
        x_, u_ = xu[: x.shape[-1]], xu[x.shape[-1]:]
        return con.evaluate(x_, u_) @ lam

    xu = jnp.concatenate([x, u])
    return jax.jacfwd(jax.grad(lam_c))(xu)


def change_dimension(con: AbstractConstraint, n: int, m: int, ix=None, iu=None):
    """Re-index a constraint into a larger space — the reference's generic
    fallback wraps in an IndexedConstraint (constraints.jl:934-936)."""
    return IndexedConstraint.create(n, m, con, ix=ix, iu=iu)
