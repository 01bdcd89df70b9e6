"""Host-literal conversion for closure pytrees.

A jitted function that CLOSES OVER live ``jax.Array``s keeps those device
buffers referenced by the executable.  On tunneled/remote TPU backends
(axon) this permanently degrades every subsequent dispatch in the process
to ~27 ms (measured; the trigger is the first execution of such a program,
and the penalty is not cleared by ``jax.clear_caches``).  Closing over
HOST numpy arrays instead embeds them as program literals — dispatch stays
at ~0.1 ms — and is semantically identical for trace-time constants.

Rule of thumb for this framework: problem data that a solver factory
closes over (objective coefficients, constraint parameters, time grids,
model parameters) goes through :func:`to_host` first; per-call data
(states, trajectories, solutions) is always passed as jit arguments.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["to_host"]


def to_host(tree):
    """Return ``tree`` with every ``jax.Array`` leaf fetched to a host
    numpy array (static/aux fields untouched)."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, tree)
