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
    n_passive = 3  # world position does not enter the dynamics

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

    def dynamics_jacobian(self, x, u, t):
        """Closed-form (df/dx, df/du) — the reference's UserDefined analytic
        rule pattern, here for the hottest linearization in the framework.

        Validated against jacfwd to round-off (tests/test_dynamics.py).
        Includes the quaternion-normalization chain dq_hat/dq =
        (I - q_hat q_hat')/||q||.
        """
        dtype = x.dtype
        q_raw = x[3:7]
        qn = jnp.linalg.norm(q_raw)
        q = q_raw / qn
        w = x[10:13]
        kf, km, L = self.kf, self.km, self.motor_dist
        mass = self.mass
        Jd = jnp.array([self.Jx, self.Jy, self.Jz], dtype)

        def skew(v):
            return jnp.array([[0.0, -v[2], v[1]],
                              [v[2], 0.0, -v[0]],
                              [-v[1], v[0], 0.0]], dtype)

        gate = (u > 0).astype(dtype)          # d max(0, kf u)/du
        F = jnp.maximum(0.0, kf * u)
        Fz = F[0] + F[1] + F[2] + F[3]
        Fb = jnp.array([0.0, 0.0, Fz], dtype)

        # dq_hat/dq: normalization chain
        dqhat = (jnp.eye(4, dtype=dtype) - jnp.outer(q, q)) / qn

        Af = jnp.zeros((13, 13), dtype)
        # pdot = v
        Af = Af.at[0:3, 7:10].set(jnp.eye(3, dtype=dtype))

        # qdot = 0.5 q (x) [0, w]  =>  d/dq_hat = 0.5 Rright([0, w])
        Rr = jnp.zeros((4, 4), dtype)
        Rr = Rr.at[0, 1:].set(-w)
        Rr = Rr.at[1:, 0].set(w)
        Rr = Rr.at[1:, 1:].set(-skew(w))
        Af = Af.at[3:7, 3:7].set(0.5 * Rr @ dqhat)
        # d/dw = 0.5 L(q) H
        from ..utils.quaternions import lmult
        Af = Af.at[3:7, 10:13].set(0.5 * lmult(q)[:, 1:])

        # vdot = g + R(q) Fb / m; rotate r = Fb + 2 qw t + 2 qv x t, t = qv x Fb
        qw, qv = q[0], q[1:]
        tvec = jnp.cross(qv, Fb)
        dr_dqw = 2.0 * tvec
        dr_dqv = -2.0 * qw * skew(Fb) - 2.0 * skew(tvec) - 2.0 * skew(qv) @ skew(Fb)
        dr_dqhat = jnp.concatenate([dr_dqw[:, None], dr_dqv], axis=1)  # (3, 4)
        Af = Af.at[7:10, 3:7].set(dr_dqhat @ dqhat / mass)

        # wdot = Jinv (tau - w x (J w))
        dwdot_dw = -(skew(w) * Jd[None, :] - skew(Jd * w)) / Jd[:, None]
        Af = Af.at[10:13, 10:13].set(dwdot_dw)

        Bf = jnp.zeros((13, 4), dtype)
        # vdot: R(q) e3 * kf gate / m
        from ..utils.quaternions import quat_rotate
        Re3 = quat_rotate(q, jnp.array([0.0, 0.0, 1.0], dtype))
        Bf = Bf.at[7:10, :].set(Re3[:, None] * (kf * gate)[None, :] / mass)
        # wdot: Jinv dtau/du
        kfg = kf * gate
        dtau = jnp.array(
            [[0.0, L * kfg[1], 0.0, -L * kfg[3]],
             [-L * kfg[0], 0.0, L * kfg[2], 0.0],
             [km, -km, km, -km]], dtype)
        Bf = Bf.at[10:13, :].set(dtau / Jd[:, None])
        return Af, Bf

    def dynamics_jacobian_batch(self, xs, us, ts):
        """Batched closed-form (Af, Bf) over a leading K axis, assembled
        SCATTER-FREE: every block is built with stacks/concats of dense
        (K, ., .) pieces, never ``.at[].set`` (XLA lowers those to scatters,
        which are abysmal on TPU — the reason the per-item analytic path
        measured 3x slower end-to-end).  Same math as
        :meth:`dynamics_jacobian`; validated against it and against jacfwd
        in tests/test_dynamics.py."""
        K = xs.shape[0]
        dtype = xs.dtype
        q_raw = xs[:, 3:7]
        w = xs[:, 10:13]
        qn = jnp.linalg.norm(q_raw, axis=-1, keepdims=True)        # (K, 1)
        q = q_raw / qn
        kf, km, L = self.kf, self.km, self.motor_dist
        mass = self.mass
        Jd = jnp.array([self.Jx, self.Jy, self.Jz], dtype)
        gate = (us > 0).astype(dtype)                               # (K, 4)
        Fz = jnp.sum(jnp.maximum(0.0, kf * us), axis=-1)            # (K,)

        z3 = jnp.zeros((K, 3, 3), dtype)
        z34 = jnp.zeros((K, 3, 4), dtype)
        z43 = jnp.zeros((K, 4, 3), dtype)
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3))
        zK = jnp.zeros((K,), dtype)

        def bskew(v):                                               # (K, 3, 3)
            return jnp.stack([
                jnp.stack([zK, -v[:, 2], v[:, 1]], -1),
                jnp.stack([v[:, 2], zK, -v[:, 0]], -1),
                jnp.stack([-v[:, 1], v[:, 0], zK], -1)], -2)

        # normalization chain dq_hat/dq = (I4 - q q^T)/||q||
        dqhat = (jnp.broadcast_to(jnp.eye(4, dtype=dtype), (K, 4, 4))
                 - q[:, :, None] * q[:, None, :]) / qn[:, :, None]
        # qdot = 0.5 q (x) [0; w]: d/dq_hat = 0.5 Rright([0; w])
        Rr = jnp.concatenate([
            jnp.concatenate([zK[:, None, None], -w[:, None, :]], -1),
            jnp.concatenate([w[:, :, None], -bskew(w)], -1)], -2)   # (K, 4, 4)
        dq_dq = 0.5 * jnp.einsum("kij,kjl->kil", Rr, dqhat)
        # d/dw = 0.5 L(q) H = 0.5 L(q)[:, 1:]
        qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        dq_dw = 0.5 * jnp.stack([
            jnp.stack([-qx, -qy, -qz], -1),
            jnp.stack([qw, -qz, qy], -1),
            jnp.stack([qz, qw, -qx], -1),
            jnp.stack([-qy, qx, qw], -1)], -2)                      # (K, 4, 3)

        # vdot = g + R(q) Fb / m, Fb = [0, 0, Fz]:
        # r = Fb + 2 qw t + 2 qv x t with t = qv x Fb
        qv = q[:, 1:]
        tvec = jnp.stack([qv[:, 1] * Fz, -qv[:, 0] * Fz, zK], -1)   # qv x Fb
        skewFb = bskew(jnp.stack([zK, zK, Fz], -1))
        dr_dqw = 2.0 * tvec
        dr_dqv = (-2.0 * qw[:, None, None] * skewFb - 2.0 * bskew(tvec)
                  - 2.0 * jnp.einsum("kij,kjl->kil", bskew(qv), skewFb))
        dr_dqhat = jnp.concatenate([dr_dqw[:, :, None], dr_dqv], -1)
        dv_dq = jnp.einsum("kij,kjl->kil", dr_dqhat, dqhat) / mass  # (K, 3, 4)

        # wdot = Jinv (tau - w x (J w))
        dw_dw = -(bskew(w) * Jd[None, None, :]
                  - bskew(Jd[None, :] * w)) / Jd[None, :, None]

        Af = jnp.concatenate([
            jnp.concatenate([z3, z34, eye3, z3], -1),
            jnp.concatenate([z43, dq_dq, z43, dq_dw], -1),
            jnp.concatenate([z3, dv_dq, z3, z3], -1),
            jnp.concatenate([z3, z34, z3, dw_dw], -1)], -2)

        # Bf: vdot rows R(q) e3 kf gate / m; wdot rows Jinv dtau/du
        e3 = jnp.array([0.0, 0.0, 1.0], dtype)
        tv = jnp.stack([2.0 * qv[:, 1], -2.0 * qv[:, 0], zK], -1)   # 2 qv x e3
        Re3 = e3[None, :] + qw[:, None] * tv + jnp.cross(qv, tv)
        Bv = Re3[:, :, None] * (kf * gate)[:, None, :] / mass       # (K, 3, 4)
        kfg = kf * gate
        kmK = jnp.full((K,), km, dtype)
        dtau = jnp.stack([
            jnp.stack([zK, L * kfg[:, 1], zK, -L * kfg[:, 3]], -1),
            jnp.stack([-L * kfg[:, 0], zK, L * kfg[:, 2], zK], -1),
            jnp.stack([kmK, -kmK, kmK, -kmK], -1)], -2)             # (K, 3, 4)
        Bw = dtau / Jd[None, :, None]
        Bf = jnp.concatenate(
            [jnp.zeros((K, 7, 4), dtype), Bv, Bw], -2)
        return Af, Bf

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

    # Structured form of the same E(x): blockdiag(I3, G(q), I6) — lets the
    # solver transform expansions without materializing E (dynamics.Model
    # errstate_block protocol).
    errstate_block = (3, 7)

    def errstate_G(self, x):
        return attitude_jacobian(x[3:7])

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
