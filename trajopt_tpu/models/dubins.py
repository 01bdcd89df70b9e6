"""Dubins car / unicycle (RobotZoo.DubinsCar role; parallel-park and
obstacle-field benchmarks, test/test_models.jl:35-223)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..dynamics import Model


@struct.dataclass
class DubinsCar(Model):
    """x = [px, py, theta], u = [v, omega]."""

    radius: float = 0.175  # body radius, used to inflate obstacles

    n = 3
    m = 2
    n_passive = 2  # x, y are cyclic; only theta enters the dynamics

    def dynamics(self, x, u, t):
        theta = x[2]
        v, w = u[0], u[1]
        return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), w])
