"""Torque-actuated pendulum (RobotZoo.Pendulum role)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..dynamics import Model


@struct.dataclass
class Pendulum(Model):
    """x = [theta, thetadot], u = [torque]; theta = pi is upright."""

    mass: float = 1.0
    length: float = 0.5
    b: float = 0.1  # viscous damping
    g: float = 9.81

    n = 2
    m = 1

    def dynamics(self, x, u, t):
        theta, thetadot = x[0], x[1]
        ml2 = self.mass * self.length ** 2
        thetaddot = (u[0] - self.mass * self.g * self.length * jnp.sin(theta)
                     - self.b * thetadot) / ml2
        return jnp.stack([thetadot, thetaddot])
