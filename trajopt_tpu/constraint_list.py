"""ConstraintList: constraints x knot-point index sets.

TPU-native re-design of /root/reference/src/constraint_list.jl.  The list is
a host-side builder (mutable, like the reference's ``add_constraint!``); at
solve time it compiles to a tuple of *constraint blocks* — each block is a
constraint pytree plus a static knot-index array — so heterogeneous
constraint sets become a fixed set of statically-shaped vmapped kernels (one
per block) instead of dynamic shapes.
"""
from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple, Union

import numpy as np

from .cones import Cone
from .constraints import AbstractConstraint

__all__ = ["ConstraintList", "num_constraints"]

KnotIndices = Union[int, range, Sequence[int]]


def _normalize_inds(inds: KnotIndices, N: int) -> Tuple[int, ...]:
    if isinstance(inds, (int, np.integer)):
        inds = (int(inds),)
    inds = tuple(int(i) for i in inds)
    if len(inds) == 0:
        raise ValueError("constraint must be applied to at least one knot point")
    for i in inds:
        if not (0 <= i < N):
            raise ValueError(f"knot index {i} out of range [0, {N})")
    if list(inds) != sorted(set(inds)):
        raise ValueError("knot indices must be strictly increasing")
    return inds


class ConstraintList:
    """Ordered collection of (constraint, knot-indices) pairs
    (constraint_list.jl:25-134).

    Uses 0-based knot indices; the terminal knot is ``N-1``.  Control- and
    stage-input constraints may not include the terminal knot (the reference
    restricts ControlConstraints to 1:N-1, constraint_list.jl:107-112).
    """

    def __init__(self, n: int, m: int, N: int):
        self.n = n
        self.m = m
        self.N = N
        self.constraints: List[AbstractConstraint] = []
        self.inds: List[Tuple[int, ...]] = []

    # -- construction (constraint_list.jl:103-134) ----------------------------
    def add_constraint(self, con: AbstractConstraint, inds: KnotIndices, idx: int = None):
        inds = _normalize_inds(inds, self.N)
        n = getattr(con, "n", self.n)
        m = getattr(con, "m", self.m)
        if con.kind in ("stage", "state") and n not in (0, self.n):
            raise ValueError(f"constraint state dim {n} != problem state dim {self.n}")
        if con.kind in ("stage", "control") and m not in (0, self.m):
            raise ValueError(f"constraint control dim {m} != problem control dim {self.m}")
        if con.kind in ("stage", "control") and (self.N - 1) in inds:
            raise ValueError("control-dependent constraints cannot include the terminal knot")
        if idx is None:
            self.constraints.append(con)
            self.inds.append(inds)
        else:
            self.constraints.insert(idx, con)
            self.inds.insert(idx, inds)
        return self

    # -- iteration / indexing (constraint_list.jl:137-150) --------------------
    def __len__(self) -> int:
        return len(self.constraints)

    def __getitem__(self, i: int) -> AbstractConstraint:
        return self.constraints[i]

    def __iter__(self):
        return iter(self.constraints)

    def zip(self) -> Iterable[Tuple[Tuple[int, ...], AbstractConstraint]]:
        return zip(self.inds, self.constraints)

    def constraintindices(self, k: int) -> List[int]:
        """Indices of constraints active at knot k (constraint_list.jl:175)."""
        return [i for i, inds in enumerate(self.inds) if k in inds]

    # -- bookkeeping ----------------------------------------------------------
    def num_constraints(self) -> np.ndarray:
        """Per-knot constraint counts p (constraint_list.jl:42,198-206)."""
        p = np.zeros(self.N, dtype=int)
        for con, inds in zip(self.constraints, self.inds):
            for k in inds:
                p[k] += con.output_dim
        return p

    @property
    def senses(self) -> List[Cone]:
        return [c.sense for c in self.constraints]

    def copy(self) -> "ConstraintList":
        out = ConstraintList(self.n, self.m, self.N)
        out.constraints = list(self.constraints)
        out.inds = list(self.inds)
        return out

    # -- solver view ----------------------------------------------------------
    def blocks(self) -> Tuple[Tuple[AbstractConstraint, Tuple[int, ...]], ...]:
        """Static block structure the AL solver iterates over at trace time."""
        return tuple(zip(self.constraints, self.inds))


def num_constraints(cons: ConstraintList) -> np.ndarray:
    return cons.num_constraints()
