"""Solvers: iLQR, AL-iLQR, ALTRO (the Altro.jl role, SURVEY.md §2.2/§3.5)."""
from .options import SolverOptions
from .ilqr import ILQRResult, ilqr_solve
from .al import ALSolution, ConstraintBlock, SolveStats, al_solve, make_al_functions
from .altro import (ALTROSolver, AugmentedLagrangianSolver,
                    ProjectedNewtonSolver, iLQRSolver, solve, solve_problem)
from .cascade import cascade_solve, resample_knots, resample_solution
from .dircol import DIRCOLOptions, DIRCOLSolver

__all__ = [
    "DIRCOLOptions",
    "DIRCOLSolver",
    "SolverOptions",
    "ILQRResult",
    "ilqr_solve",
    "ALSolution",
    "SolveStats",
    "ConstraintBlock",
    "al_solve",
    "cascade_solve",
    "resample_knots",
    "resample_solution",
    "make_al_functions",
    "ALTROSolver",
    "AugmentedLagrangianSolver",
    "ProjectedNewtonSolver",
    "iLQRSolver",
    "solve",
    "solve_problem",
]
