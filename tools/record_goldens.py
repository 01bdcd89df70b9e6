"""Re-record the golden trajectories for the five BASELINE configs.

Run on CPU + f64 (the validation precision, SURVEY.md §7):

    PYTHONPATH=/root/repo:/root/.axon_site python3 tools/record_goldens.py

Goldens are regression gates (tests/test_golden.py): they pin the
u-trajectory the DEFAULT-options solver produces, so any solver change that
moves a converged optimum past the 1e-4 parity tolerance fails the suite.
Independent quality anchors (Ipopt bounds from /root/reference/test/
moi_test.jl) are asserted separately in tests/test_solve.py — re-recording
goldens cannot weaken those.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    from test_golden import CONFIGS  # the single source of truth
    from trajopt_tpu.solvers import ALTROSolver

    golden = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    for name, (builder, opts) in sorted(CONFIGS.items()):
        prob = builder()
        solver = ALTROSolver(prob, opts)
        sol = solver.solve()
        assert bool(sol.converged), f"{name} did not converge"
        viol = float(sol.max_violation)
        assert viol < 1e-6, f"{name} viol {viol:.2e}"
        np.save(os.path.join(golden, f"{name}_us.npy"), np.asarray(sol.us))
        np.save(os.path.join(golden, f"{name}_xs.npy"), np.asarray(sol.xs))
        np.save(os.path.join(golden, f"{name}_meta.npy"),
                np.array([float(sol.J), viol]))
        print(f"{name}: J {float(sol.J):.8g} viol {viol:.2e} "
              f"iters {int(sol.iterations)}/{int(sol.outer_iterations)}")


if __name__ == "__main__":
    main()
