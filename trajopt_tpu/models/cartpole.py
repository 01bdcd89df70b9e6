"""Cart-pole (RobotZoo.Cartpole role; the swing-up benchmark model,
examples/Cartpole.ipynb, test/test_models.jl:4-32)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..dynamics import Model


@struct.dataclass
class Cartpole(Model):
    """x = [y, theta, ydot, thetadot]; theta = pi is the upright goal.

    Manipulator-form dynamics H qdd + C qd + G = B u with the RobotZoo
    parameter defaults (mc = 1, mp = 0.2, l = 0.5).
    """

    mc: float = 1.0
    mp: float = 0.2
    l: float = 0.5
    g: float = 9.81

    n = 4
    m = 1
    n_passive = 1  # cart position does not enter the dynamics

    def dynamics(self, x, u, t):
        mc, mp, l, g = self.mc, self.mp, self.l, self.g
        qd = x[2:]
        s = jnp.sin(x[1])
        c = jnp.cos(x[1])
        # H qdd = -(C qd + G - B u); H is 2x2 SPD — solve with the explicit
        # inverse (keeps the kernel branch-free and f64-friendly on TPU,
        # which lacks an f64 LU).
        h11 = mc + mp
        h12 = mp * l * c
        h22 = mp * l * l
        b1 = -(-mp * qd[1] * l * s * qd[1] + 0.0 - u[0])
        b2 = -(mp * g * l * s)
        det = h11 * h22 - h12 * h12
        qdd1 = (h22 * b1 - h12 * b2) / det
        qdd2 = (h11 * b2 - h12 * b1) / det
        return jnp.stack([qd[0], qd[1], qdd1, qdd2])
