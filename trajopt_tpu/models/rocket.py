"""Rocket soft-landing model for the SOCP benchmark config
(BASELINE.json configs; SOC machinery from src/cones.jl + test/socp.jl).

Linear 3-DOF rocket: x = [p(3); v(3)] in an inertial frame with gravity,
u = thrust vector (3,).  The interesting structure is in the constraints:
a thrust upper bound ||u|| <= u_max (SOC) and a thrust pointing cone
||u_xy|| <= tan(gamma) * u_z (SOC via LinearConstraint).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..cones import SecondOrderCone
from ..constraints import LinearConstraint
from ..dynamics import Model


@struct.dataclass
class Rocket(Model):
    mass: float = 10.0
    gravity: float = -9.81

    n = 6
    m = 3
    n_passive = 3  # position does not enter the dynamics

    def dynamics(self, x, u, t):
        v = x[3:6]
        g = jnp.array([0.0, 0.0, self.gravity], x.dtype)
        a = g + u / self.mass
        return jnp.concatenate([v, a])


def thrust_cone_constraint(n: int, m: int, gamma: float) -> LinearConstraint:
    """Pointing cone ||u_xy|| <= tan(gamma) u_z as the SOC constraint
    A u in K_soc with A = [[1,0,0],[0,1,0],[0,0,tan(gamma)]] (the
    LinearConstraint-with-SecondOrderCone pattern, constraints.jl:103-150)."""
    A = np.zeros((3, 3))
    A[0, 0] = 1.0
    A[1, 1] = 1.0
    A[2, 2] = np.tan(gamma)
    b = np.zeros(3)
    return LinearConstraint.create(n, m, A, b, sense=SecondOrderCone,
                                   inds=range(n, n + m))
