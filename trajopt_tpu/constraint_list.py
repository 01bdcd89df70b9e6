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

    def __init__(self, n, m, N: int = None):
        if np.ndim(n) == 1:
            # Per-knot dims form: ConstraintList(nx, nu) — hybrid model
            # vectors with dimension-changing jump maps
            # (constraint_list.jl:36-37; hybrid_dynamics_model.jl:88-98).
            nx = [int(v) for v in n]
            nu = [int(v) for v in m]
            if len(nx) != len(nu):
                raise ValueError("nx and nu must have equal length N")
            if N is not None and N != len(nx):
                raise ValueError(f"N={N} != len(nx)={len(nx)}")
            self.nx, self.nu = nx, nu
            self.N = len(nx)
            uniform = len(set(nx)) == 1 and len(set(nu)) == 1
            self.n = nx[0] if uniform else None
            self.m = nu[0] if uniform else None
        else:
            if N is None:
                raise ValueError("ConstraintList(n, m, N) requires N")
            self.n = int(n)
            self.m = int(m)
            self.N = int(N)
            self.nx = [self.n] * self.N
            self.nu = [self.m] * self.N
        self.constraints: List[AbstractConstraint] = []
        self.inds: List[Tuple[int, ...]] = []
        # Per-constraint derivative method, the reference's ``diffs`` vector
        # (constraint_list.jl:40-41): "ad" (ForwardAD / analytic UserDefined
        # overrides) or "fd" (FiniteDifference).
        self.diffs: List[str] = []

    @classmethod
    def from_models(cls, models) -> "ConstraintList":
        """Per-knot dims from a hybrid model vector (``ConstraintList(models)``;
        hybrid_dynamics_model.jl:88)."""
        from .dynamics import dims

        nx, nu = dims(models)
        return cls(nx, nu)

    # -- construction (constraint_list.jl:103-134) ----------------------------
    def add_constraint(self, con: AbstractConstraint, inds: KnotIndices, idx: int = None,
                       diff_method: str = "ad"):
        if diff_method not in ("ad", "fd"):
            raise ValueError(f"unknown diff_method {diff_method!r} (use 'ad' or 'fd')")
        inds = _normalize_inds(inds, self.N)
        for k in inds:
            n = getattr(con, "n", self.nx[k])
            m = getattr(con, "m", self.nu[k])
            if con.kind in ("stage", "state") and n not in (0, self.nx[k]):
                raise ValueError(
                    f"DimensionMismatch: constraint state dim {n} != state dim "
                    f"{self.nx[k]} at knot {k}"
                )
            if con.kind in ("stage", "control") and m not in (0, self.nu[k]):
                raise ValueError(
                    f"DimensionMismatch: constraint control dim {m} != control "
                    f"dim {self.nu[k]} at knot {k}"
                )
        if con.kind in ("stage", "control") and (self.N - 1) in inds:
            raise ValueError("control-dependent constraints cannot include the terminal knot")
        if idx is None:
            self.constraints.append(con)
            self.inds.append(inds)
            self.diffs.append(diff_method)
        else:
            self.constraints.insert(idx, con)
            self.inds.insert(idx, inds)
            self.diffs.insert(idx, diff_method)
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
        out = ConstraintList(list(self.nx), list(self.nu))
        out.constraints = list(self.constraints)
        out.inds = list(self.inds)
        out.diffs = list(self.diffs)
        return out

    # -- solver view ----------------------------------------------------------
    def blocks(self) -> Tuple[Tuple[AbstractConstraint, Tuple[int, ...]], ...]:
        """Static block structure the AL solver iterates over at trace time."""
        return tuple(zip(self.constraints, self.inds))


def num_constraints(cons: ConstraintList) -> np.ndarray:
    return cons.num_constraints()
