"""Knot points and sampled trajectories.

TPU-native equivalent of RobotDynamics.jl's ``KnotPoint`` /
``SampledTrajectory`` as imported and re-exported by the reference
(/root/reference/src/TrajectoryOptimization.jl:16,36 exports ``Traj`` and
``KnotPoint``; behavior anchors: problem.jl:42,58-61,106 and
test/cost_tests.jl:8-9,235-236 terminal-knot semantics).

The solvers operate on dense ``(N, n)`` / ``(N, m)`` arrays directly (the
idiomatic XLA layout — one tensor per field, vmap over knots and scenarios);
these containers are the user-facing structure-of-arrays view with the
reference's accessor surface.  Both are pytrees, so a ``SampledTrajectory``
can cross jit boundaries and be vmapped over a scenario axis unchanged.

Terminal-knot semantics (test/cost_tests.jl:8-9): the last knot carries
``dt == 0`` and ``is_terminal`` true; its control row exists but is unused
(cost/constraint evaluation drops u-terms there, cost_functions.jl:141).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["KnotPoint", "SampledTrajectory", "Traj"]


@struct.dataclass
class KnotPoint:
    """One knot: state, control, time, and time step (``z = [x; u], t, dt``).

    ``dt == 0`` marks the terminal knot (RD ``is_terminal``,
    test/cost_tests.jl:8-9).
    """

    x: jax.Array
    u: jax.Array
    t: jax.Array
    dt: jax.Array

    @property
    def z(self) -> jax.Array:
        """Concatenated ``[x; u]`` (the reference's ``get_z``)."""
        return jnp.concatenate([self.x, self.u])

    @property
    def is_terminal(self) -> jax.Array:
        return self.dt == 0

    @property
    def n(self) -> int:
        return self.x.shape[-1]

    @property
    def m(self) -> int:
        return self.u.shape[-1]


@struct.dataclass
class SampledTrajectory:
    """Dense state/control trajectory with its time grid (RD
    ``SampledTrajectory``; problem.jl:42,106).

    Fields: ``xs (N, n)``, ``us (N, m)`` (terminal control row unused),
    ``times (N,)``, ``dts (N,)`` with ``dts[N-1] == 0``.  Uneven time steps
    are supported (test/problems_tests.jl:79-82).
    """

    xs: jax.Array
    us: jax.Array
    times: jax.Array
    dts: jax.Array

    @classmethod
    def create(
        cls,
        xs,
        us,
        tf: Optional[float] = None,
        dt: Optional[Union[float, Sequence[float]]] = None,
        t0: float = 0.0,
    ) -> "SampledTrajectory":
        """Build from dense arrays plus either ``tf`` or (possibly per-step)
        ``dt`` (mirrors the ``SampledTrajectory{Nx,Nu}(X0, U0; tf)`` ctor,
        problem.jl:106).  An ``(N-1, m)`` control array is padded with a zero
        terminal row."""
        xs = jnp.asarray(xs)
        us = jnp.asarray(us)
        N = xs.shape[0]
        if us.shape[0] == N - 1:
            us = jnp.concatenate([us, jnp.zeros((1, us.shape[1]), us.dtype)])
        if us.shape[0] != N:
            raise ValueError(f"controls length {us.shape[0]} != N={N}")
        if dt is not None:
            dtv = np.asarray(dt, dtype=float)
            if dtv.ndim == 0:
                dtv = np.full(N - 1, float(dtv))
            if dtv.shape != (N - 1,):
                raise ValueError(f"dt must be scalar or length N-1={N - 1}")
        else:
            if tf is None:
                raise ValueError("provide either tf or dt")
            dtv = np.full(N - 1, tf / (N - 1))
        times = t0 + np.concatenate([[0.0], np.cumsum(dtv)])
        dts = np.concatenate([dtv, [0.0]])
        return cls(
            xs=xs,
            us=us,
            times=jnp.asarray(times, xs.dtype),
            dts=jnp.asarray(dts, xs.dtype),
        )

    # -- accessors (problem.jl:134-231 surface) -------------------------------
    @property
    def N(self) -> int:
        return self.xs.shape[-2]

    @property
    def n(self) -> int:
        return self.xs.shape[-1]

    @property
    def m(self) -> int:
        return self.us.shape[-1]

    def states(self, k: Optional[int] = None) -> jax.Array:
        return self.xs if k is None else self.xs[k]

    def controls(self, k: Optional[int] = None) -> jax.Array:
        return self.us[..., :-1, :] if k is None else self.us[k]

    def gettimes(self) -> jax.Array:
        return self.times

    @property
    def tf(self) -> jax.Array:
        return self.times[..., -1]

    def __len__(self) -> int:
        return self.N

    def __getitem__(self, k: int) -> KnotPoint:
        return KnotPoint(x=self.xs[k], u=self.us[k], t=self.times[k],
                         dt=self.dts[k])

    def __iter__(self):
        return (self[k] for k in range(self.N))

    # -- MPC helpers -----------------------------------------------------------
    def set_initial_time(self, t0: float) -> "SampledTrajectory":
        """Shift the time grid to start at ``t0`` (``setinitialtime!``,
        problem.jl:280-284)."""
        return self.replace(times=self.times - self.times[..., :1] + t0)

    def shift(self) -> "SampledTrajectory":
        """One-knot receding-horizon shift, repeating the final knot — the
        MPC warm start (SURVEY.md §5 'Checkpoint / resume')."""
        roll = lambda a: jnp.concatenate([a[..., 1:, :], a[..., -1:, :]],
                                         axis=-2)
        return self.replace(xs=roll(self.xs), us=roll(self.us))


Traj = SampledTrajectory
