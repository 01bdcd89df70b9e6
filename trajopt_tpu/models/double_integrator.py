"""Planar / d-dimensional double integrator (examples/quickstart.jl:11-23)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..dynamics import Model


@struct.dataclass
class DoubleIntegrator(Model):
    """x = [pos(d); vel(d)], u = accel * mass (quickstart.jl:15-23)."""

    mass: float = 1.0
    d: int = struct.field(pytree_node=False, default=2)

    @property
    def n(self) -> int:
        return 2 * self.d

    @property
    def m(self) -> int:
        return self.d

    @property
    def n_passive(self) -> int:
        return self.d  # positions do not enter the dynamics

    def dynamics(self, x, u, t):
        v = x[self.d:]
        a = u / self.mass
        return jnp.concatenate([v, a])
