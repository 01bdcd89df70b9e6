"""Free-function API mirroring the reference's exported methods.

The reference exports method-style functions operating on a ``Problem`` or a
solver (/root/reference/src/TrajectoryOptimization.jl:41-57: ``cost``,
``max_violation``, ``initial_controls!``, ``initial_states!``,
``initial_trajectory!``, ``rollout!``, ``states``, ``controls``,
``get_trajectory``, ``gettimes``, ``get_objective``, ``get_constraints``,
``get_model``, ``horizonlength``, ``state_dim``, ``control_dim``, and
``add_constraint!``).  Users coming from the reference find the same names
here as thin dispatchers over :class:`~trajopt_tpu.problem.Problem`,
:class:`~trajopt_tpu.solvers.altro.ALTROSolver`, and
:class:`~trajopt_tpu.trajectories.SampledTrajectory` (mutating ``!``
functions drop the bang and return the updated object, matching the rest of
this package's host-side API).
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from .constraint_list import ConstraintList
from .dynamics import DiscreteModel, Model
from .problem import Problem
from .trajectories import SampledTrajectory

__all__ = [
    "add_constraint",
    "controls",
    "cost",
    "control_dim",
    "get_constraints",
    "get_model",
    "get_objective",
    "get_trajectory",
    "gettimes",
    "horizonlength",
    "initial_controls",
    "initial_states",
    "initial_trajectory",
    "max_violation",
    "rollout",
    "set_goal_state",
    "set_initial_state",
    "state_dim",
    "states",
]


def state_dim(obj) -> int:
    """State dimension of a model, problem, or trajectory (RD ``state_dim``)."""
    if isinstance(obj, (Model, DiscreteModel, Problem, SampledTrajectory)):
        return obj.n
    raise TypeError(f"state_dim: unsupported type {type(obj).__name__}")


def control_dim(obj) -> int:
    """Control dimension of a model, problem, or trajectory (RD ``control_dim``)."""
    if isinstance(obj, (Model, DiscreteModel, Problem, SampledTrajectory)):
        return obj.m
    raise TypeError(f"control_dim: unsupported type {type(obj).__name__}")


def _as_problem(obj) -> Problem:
    if isinstance(obj, Problem):
        return obj
    prob = getattr(obj, "prob", None)  # ALTROSolver wraps a Problem
    if isinstance(prob, Problem):
        return prob
    raise TypeError(f"expected a Problem (or solver), got {type(obj).__name__}")


def cost(obj, *args) -> jax.Array:
    """Total trajectory cost (problem.jl:321; objective.jl:89).

    ``cost(prob)`` evaluates the problem's current trajectory;
    ``cost(objective, xs, us)`` / ``cost(objective, traj)`` evaluate an
    :class:`Objective` directly."""
    if isinstance(obj, Problem):
        return obj.cost()
    if args:
        if len(args) == 1 and isinstance(args[0], SampledTrajectory):
            return obj.cost(args[0].xs, args[0].us)
        return obj.cost(*args)
    if hasattr(obj, "cost"):
        return obj.cost()
    raise TypeError(f"cost: unsupported arguments ({type(obj).__name__})")


def max_violation(obj, xs=None, us=None) -> jax.Array:
    """Worst constraint violation (docs/old/solver_interface.md: constrained
    solvers implement ``max_violation``).

    ``max_violation(prob)`` evaluates the problem's constraint list at its
    current (or a given) trajectory; on a solved
    :class:`~trajopt_tpu.solvers.altro.ALTROSolver` it reads the solution."""
    from .solvers.al import eval_blocks, max_violation_blocks
    from .solvers.altro import ALTROSolver, _problem_blocks

    if isinstance(obj, ALTROSolver):
        return obj.max_violation()
    prob = _as_problem(obj)
    blocks = _problem_blocks(prob)
    if not blocks:
        return jnp.zeros((), prob.x0.dtype)
    xs = prob.xs if xs is None else xs
    us = prob.us if us is None else us
    return max_violation_blocks(blocks, eval_blocks(blocks, xs, us))


def rollout(obj, *args, **kwargs):
    """Forward-simulate (problem.jl:330-340).

    ``rollout(prob)`` simulates the problem from ``x0`` under its current
    controls and stores the states; ``rollout(model, x0, us, times, dts)``
    is the low-level scan (:func:`trajopt_tpu.dynamics.rollout`)."""
    if isinstance(obj, Problem):
        return obj.rollout()
    from .dynamics import rollout as _rollout

    return _rollout(obj, *args, **kwargs)


def states(obj, k=None):
    """State trajectory (problem.jl:151)."""
    return obj.states(k) if k is not None else obj.states()


def controls(obj, k=None):
    """Control trajectory, excluding the unused terminal row (problem.jl:156)."""
    return obj.controls(k) if k is not None else obj.controls()


def gettimes(obj):
    return obj.gettimes()


def get_model(obj):
    return obj.get_model()


def get_objective(obj):
    return obj.get_objective()


def get_constraints(obj):
    return obj.get_constraints()


def get_trajectory(obj) -> SampledTrajectory:
    """Current trajectory as a :class:`SampledTrajectory` (problem.jl:147).

    (``Problem.get_trajectory()`` itself returns the raw ``(xs, us)`` arrays
    the solvers consume; this free function wraps them with the time grid.)"""
    if isinstance(obj, SampledTrajectory):
        return obj
    prob = _as_problem(obj)
    return SampledTrajectory(xs=prob.xs, us=prob.us, times=prob.times,
                             dts=prob.dts)


def horizonlength(obj) -> int:
    if isinstance(obj, SampledTrajectory):
        return obj.N
    return _as_problem(obj).horizonlength()


def initial_states(obj, X0):
    return obj.initial_states(X0)


def initial_controls(obj, U0):
    return obj.initial_controls(U0)


def initial_trajectory(obj, X0, U0=None):
    if U0 is None and isinstance(X0, SampledTrajectory):
        return obj.initial_trajectory(X0.xs, X0.us)
    return obj.initial_trajectory(X0, U0)


def set_initial_state(prob: Problem, x0) -> Problem:
    return prob.set_initial_state(x0)


def set_goal_state(prob: Problem, xf, **kw) -> Problem:
    return prob.set_goal_state(xf, **kw)


def add_constraint(cons: ConstraintList, con, inds, idx: int = None):
    """Append a constraint over knot indices (constraint_list.jl:103-134)."""
    return cons.add_constraint(con, inds, idx)
