"""Checkpoint/resume + solver-stats tests (SURVEY.md §5 aux subsystems)."""
import numpy as np

from trajopt_tpu.benchmarks import dubins_parallel_park
from trajopt_tpu.solvers import ALTROSolver, SolverOptions, solve_problem
from trajopt_tpu.utils.serialization import (
    load_solution,
    save_solution,
    warm_start,
)


def test_solver_stats_history():
    prob = dubins_parallel_park(N=21)
    s = ALTROSolver(prob, SolverOptions())
    sol = s.solve()
    st = s.stats()
    n = int(sol.outer_iterations)
    assert len(st["cost"]) == n > 0
    # converged: the last recorded outer iteration met the tolerance (the
    # final polish may tighten max_violation further afterwards)
    assert st["violation"][-1] < 1e-4
    # violation history reaches tolerance monotonically-ish (final <= first)
    assert st["violation"][-1] <= st["violation"][0]
    assert st["inner_iterations"].sum() <= int(sol.iterations)
    assert (st["penalty_max"] > 0).all()


def test_checkpoint_roundtrip_and_warm_start(tmp_path):
    prob = dubins_parallel_park(N=21)
    opts = SolverOptions()
    sol = solve_problem(prob, opts)
    path = str(tmp_path / "sol.npz")
    save_solution(path, sol)

    # roundtrip into a template with the same structure
    sol2 = load_solution(path, sol)
    assert np.allclose(sol2.xs, sol.xs)
    assert np.allclose(sol2.us, sol.us)
    for a, b in zip(sol2.duals, sol.duals):
        assert np.allclose(a, b)

    # resume: warm-started solve converges immediately (few inner iterations)
    prob2 = dubins_parallel_park(N=21)
    duals, pens = warm_start(prob2, sol2)
    from trajopt_tpu.solvers.al import al_solve
    from trajopt_tpu.solvers.altro import _problem_blocks

    blocks = _problem_blocks(prob2)
    resumed = al_solve(prob2.model, prob2.obj, blocks, prob2.x0, prob2.us,
                       prob2.times, prob2.dts, opts, xs_init=prob2.xs,
                       duals_init=duals, penalties_init=pens)
    assert bool(resumed.converged)
    assert int(resumed.iterations) <= max(10, int(sol.iterations) // 4)
    assert float(resumed.max_violation) < opts.constraint_tolerance


def test_checkpoint_shape_mismatch_raises(tmp_path):
    prob = dubins_parallel_park(N=21)
    sol = solve_problem(prob, SolverOptions())
    path = str(tmp_path / "sol.npz")
    save_solution(path, sol)
    other = solve_problem(dubins_parallel_park(N=11), SolverOptions())
    try:
        load_solution(path, other)
        raise AssertionError("should have raised")
    except ValueError:
        pass
