"""Quadrotor rigid body with unit-quaternion attitude.

The flagship model of the reference's examples (examples/Quadrotor.ipynb):
state x = [p(3); q(4, scalar-first); v(3, world frame); w(3, body frame)],
controls u = the four motor speeds.  Parameters match the notebook's
defaults (mass 0.5, J = diag(0.0023, 0.0023, 0.004), motor_dist 0.175,
kf = 1, km = 0.0245).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..dynamics import Model
from ..utils.quaternions import attitude_jacobian, quat_err, quat_mult, quat_rotate


@struct.dataclass
class Quadrotor(Model):
    mass: float = 0.5
    Jx: float = 0.0023
    Jy: float = 0.0023
    Jz: float = 0.004
    gravity: float = -9.81
    motor_dist: float = 0.175
    kf: float = 1.0
    km: float = 0.0245

    n = 13
    m = 4

    @property
    def errstate_dim(self) -> int:
        return 12

    def dynamics(self, x, u, t):
        p, q, v, w = x[0:3], x[3:7], x[7:10], x[10:13]
        q = q / jnp.linalg.norm(q)
        kf, km, L = self.kf, self.km, self.motor_dist

        F = jnp.maximum(0.0, kf * u)  # per-motor thrusts (notebook `forces`)
        F_body = jnp.array([0.0, 0.0, F[0] + F[1] + F[2] + F[3]], x.dtype)
        M = km * u
        tau = jnp.array(
            [L * (F[1] - F[3]), L * (F[2] - F[0]), M[0] - M[1] + M[2] - M[3]],
            x.dtype,
        )

        g = jnp.array([0.0, 0.0, self.gravity], x.dtype)
        force_world = self.mass * g + quat_rotate(q, F_body)

        pdot = v
        qdot = 0.5 * quat_mult(q, jnp.concatenate([jnp.zeros((1,), x.dtype), w]))
        vdot = force_world / self.mass
        J = jnp.array([self.Jx, self.Jy, self.Jz], x.dtype)
        wdot = (tau - jnp.cross(w, J * w)) / J
        return jnp.concatenate([pdot, qdot, vdot, wdot])

    # -- error-state protocol (SURVEY.md §2.2; 13 -> 12 dims) ----------------
    def state_diff(self, x, x0):
        dq = quat_err(x[3:7], x0[3:7])
        return jnp.concatenate([x[0:3] - x0[0:3], dq, x[7:13] - x0[7:13]])

    def errstate_jacobian(self, x):
        """E(x): (13, 12) block-diagonal with the attitude Jacobian G(q)."""
        G = attitude_jacobian(x[3:7])
        E = jnp.zeros((13, 12), x.dtype)
        E = E.at[0:3, 0:3].set(jnp.eye(3, dtype=x.dtype))
        E = E.at[3:7, 3:6].set(G)
        E = E.at[7:13, 6:12].set(jnp.eye(6, dtype=x.dtype))
        return E

    @staticmethod
    def build_state(pos, quat=(1.0, 0, 0, 0), vel=(0.0, 0, 0), omega=(0.0, 0, 0)):
        return jnp.concatenate(
            [jnp.asarray(pos, dtype=float), jnp.asarray(quat, dtype=float),
             jnp.asarray(vel, dtype=float), jnp.asarray(omega, dtype=float)]
        )

    @staticmethod
    def fill_state(pos_val, quat_val, vel_val, omega_val):
        """Per-block constant state vector (RobotDynamics.fill_state)."""
        return jnp.concatenate(
            [jnp.full(3, float(pos_val)), jnp.full(4, float(quat_val)),
             jnp.full(3, float(vel_val)), jnp.full(3, float(omega_val))]
        )
