"""Quaternion / Lie-group utilities.

TPU-native equivalents of the Rotations.jl + RobotDynamics.jl machinery the
reference leans on for rigid-body states (SURVEY.md §2.2: ``state_diff``,
``errstate_dim``, ``errstate_jacobian!``, CayleyMap retraction at
lie_costs.jl:238).  Quaternions are scalar-first [w, x, y, z] unit vectors,
matching Rotations.jl's ``QuatRotation`` convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_mult",
    "quat_conj",
    "quat_rotate",
    "quat_to_rotmat",
    "lmult",
    "attitude_jacobian",
    "cayley_map",
    "inv_cayley_map",
    "quat_err",
    "normalize",
]


def normalize(q):
    return q / jnp.linalg.norm(q)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def lmult(q):
    """Left-multiplication matrix L(q): quat_mult(q, p) = L(q) @ p."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [w, -x, -y, -z],
            [x, w, -z, y],
            [y, z, w, -x],
            [z, -y, x, w],
        ],
        q.dtype,
    )


def quat_mult(q, p):
    return lmult(q) @ p


def quat_rotate(q, v):
    """Rotate 3-vector v by unit quaternion q (active rotation).

    Cross-product form (v + 2 qw (qv x v) + 2 qv x (qv x v)): ~18 mul/adds
    instead of two 4x4 quaternion products — this sits inside every RK4
    stage of the rigid-body rollout, the hottest inner loop."""
    qw, qv = q[0], q[1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_rotmat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        q.dtype,
    )


def attitude_jacobian(q):
    """G(q) = L(q) H, (4, 3) with H = [0; I3]: the tangent-space lift used for
    error-state expansions (abstract_constraint.jl:282-303)."""
    return lmult(q)[:, 1:]


def cayley_map(phi):
    """Cayley (Rodrigues-parameter) retraction: 3-vector -> unit quaternion
    (Rotations.CayleyMap, lie_costs.jl:238)."""
    one = jnp.ones((1,), phi.dtype)
    q = jnp.concatenate([one, phi])
    return q / jnp.sqrt(1.0 + phi @ phi)


def inv_cayley_map(q):
    """Inverse Cayley map: unit quaternion -> 3-vector (q_vec / q_w)."""
    return q[1:] / q[0]


def quat_err(q, q0):
    """3-dim error between quaternions via the Cayley map of the relative
    rotation (RobotDynamics ``state_diff`` for rotation blocks).

    Sign-corrected: q and -q are the same rotation, so the relative
    quaternion is flipped into the w > 0 hemisphere before the Cayley map —
    otherwise a sign flip produces a huge wrong-signed error (the same
    double-cover handling as the reference's quaternion costs,
    lie_costs.jl:84-89, constraints.jl:947-955)."""
    dq = quat_mult(quat_conj(q0), q)
    dq = jnp.where(dq[0] < 0, -dq, dq)
    return inv_cayley_map(dq)
