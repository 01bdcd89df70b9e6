"""Direct collocation (DIRCOL) solver.

The reference's solver catalogue lists a Direct Collocation solver alongside
iLQR/AL/ALTRO/ProjectedNewton (/root/reference/docs/old/solvers.md:30-33
``DIRCOLSolver``/``DIRCOLSolverOptions``; the MOI/Ipopt transcription it fed
survives in test/moi_test.jl and test/nlp_tests.jl).  This is the TPU-native
rebuild: the problem is transcribed through :class:`~trajopt_tpu.nlp.TrajOptNLP`
with compressed Hermite-Simpson collocation defects (first-order-hold
controls, a control variable at the terminal knot) and solved as a sparse
NLP.  All oracles (cost, gradient, defects, block Jacobians) are jit-compiled
JAX; the SQP loop runs on host — this is the validation/cross-check path,
while the batched AL-iLQR/ALTRO solver remains the TPU throughput path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nlp import TrajOptNLP, solve_nlp
from ..problem import Problem

__all__ = ["DIRCOLOptions", "DIRCOLSolver"]


@dataclass(frozen=True)
class DIRCOLOptions:
    """Options for :class:`DIRCOLSolver` (the reference's
    ``DIRCOLSolverOptions``)."""

    max_iterations: int = 500
    tolerance: float = 1e-10
    verbose: bool = False
    # Defect transcription: "hermite_simpson" (classic DIRCOL), or the
    # integrator-based forms shared with TrajOptNLP.
    defect: str = "hermite_simpson"


class DIRCOLSolver:
    """Direct-collocation solve with the reference's solver interface
    (docs/old/solver_interface.md: ``solve!``, ``states``, ``controls``,
    ``get_model/objective/trajectory``, ``max_violation``).

    >>> solver = DIRCOLSolver(prob)
    >>> solver.solve()
    >>> solver.cost(), solver.max_violation(), solver.iterations()
    """

    def __init__(self, prob: Problem, opts: Optional[DIRCOLOptions] = None):
        self.prob = prob
        self.opts = opts or DIRCOLOptions()
        self.nlp = TrajOptNLP(prob, remove_bounds=True,
                              defect=self.opts.defect)
        self._xs = None
        self._us = None
        self._info = None

    # -- solver interface -----------------------------------------------------
    def solve(self):
        self._xs, self._us, self._info = solve_nlp(
            self.prob,
            max_iter=self.opts.max_iterations,
            tol=self.opts.tolerance,
            verbose=self.opts.verbose,
            defect=self.opts.defect,
        )
        return self._xs, self._us

    def _require_solution(self):
        if self._info is None:
            raise RuntimeError("call solve() first")

    def states(self):
        self._require_solution()
        return self._xs

    def controls(self):
        self._require_solution()
        # terminal control is a real collocation variable under
        # hermite_simpson; expose all N rows in that case.
        if self.nlp.data.uN:
            return self._us
        return self._us[:-1]

    def get_trajectory(self):
        self._require_solution()
        return self._xs, self._us

    def get_model(self):
        return self.prob.model

    def get_objective(self):
        return self.prob.obj

    def get_constraints(self):
        return self.prob.constraints

    def cost(self) -> float:
        self._require_solution()
        return float(self._info["cost"])

    def max_violation(self) -> float:
        self._require_solution()
        return float(self._info["max_violation"])

    def iterations(self) -> int:
        self._require_solution()
        return int(self._info["iterations"])

    def converged(self) -> bool:
        self._require_solution()
        return bool(self._info["success"])

    def stats(self) -> dict:
        self._require_solution()
        return dict(self._info)
