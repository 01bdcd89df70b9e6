"""Checkpoint / resume: pytree serialization for solver state.

The reference has no checkpointing; its closest analog is the MPC
warm-start machinery (SURVEY.md §5 'Checkpoint / resume':
``initial_trajectory!``, ``set_initial_state!``, dual carry-over).  Here the
whole solver state IS one pytree (``ALSolution``: trajectory, duals,
penalties, stats), so checkpointing is flat-array IO:

* :func:`save_pytree` / :func:`load_pytree` — any pytree of arrays to/from
  one ``.npz`` file, keyed by tree path (no pickling, portable across
  processes/hosts).
* :func:`save_solution` / :func:`load_solution` — ALSolution convenience
  wrappers.
* :func:`warm_start` — resume a solve (or start an MPC loop) from a loaded
  checkpoint: re-seeds the problem trajectory and returns the dual/penalty
  pytrees for ``al_solve(duals_init=..., penalties_init=...)``.

Everything is host-side (orbax-style sharded checkpointing is unnecessary
at these sizes; a 4096-scenario batched solution is a few hundred MB and
streams through one npz).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_solution",
    "load_solution",
    "warm_start",
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "_root"


def save_pytree(path: str, tree: Any) -> None:
    """Write a pytree of arrays to one ``.npz``, keyed by tree path."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(leaves):
        # prefix with the leaf index so ordering survives any key collision
        arrays[f"{i:05d}|{_path_str(kp)}"] = np.asarray(jax.device_get(leaf))
    np.savez(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Read a ``.npz`` written by :func:`save_pytree` back into the structure
    of ``like`` (shapes/dtypes validated leaf by leaf)."""
    with np.load(path) as data:
        items = sorted(data.items(), key=lambda kv: kv[0])
        flat = [v for _, v in items]
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(flat) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(flat)} leaves, template has {len(leaves)}"
        )
    out = []
    for tmpl, arr in zip(leaves, flat):
        tmpl_arr = np.asarray(tmpl)
        if tuple(arr.shape) != tuple(tmpl_arr.shape):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {arr.shape} vs template "
                f"{tmpl_arr.shape}"
            )
        out.append(jnp.asarray(arr, dtype=tmpl_arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def save_solution(path: str, sol) -> None:
    """Checkpoint an :class:`~trajopt_tpu.solvers.ALSolution` (or any solver
    pytree) to ``.npz``."""
    save_pytree(path, sol)


def load_solution(path: str, like):
    """Load a solution checkpoint into the structure of ``like`` — typically
    a fresh solve result on the same problem (shapes must match)."""
    return load_pytree(path, like)


def warm_start(prob, sol) -> Tuple[Any, Any]:
    """Resume from a checkpointed solution: seed the problem's trajectory
    with the stored one and return ``(duals, penalties)`` for
    ``al_solve(duals_init=..., penalties_init=...)`` /
    ``mpc_step(prev=...)`` — the reference's warm-start flow
    (``initial_trajectory!`` problem.jl:242-245 + dual carry-over)."""
    prob.initial_states(sol.xs)
    prob.initial_controls(sol.us)
    return sol.duals, sol.penalties
