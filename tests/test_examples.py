"""Run the example scripts end-to-end, as the reference runs
examples/quickstart.jl inside its test suite (test/runtests.jl:37-40).

Each example is executed as a SUBPROCESS: the scripts self-configure
(CPU backend, x64) and must work outside the pytest conftest, exactly as a
user would run them.  A non-zero exit or a traceback is a failure.

The two heavy examples (quadrotor zig-zag, cartpole swing-up) re-solve
configs already covered to golden tolerance by test_golden.py/test_solve.py;
they are gated behind RUN_HEAVY_EXAMPLES=1, mirroring the reference gating
its allocation tests off on CI (test/runtests.jl:17).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

LIGHT = [
    # quickstart.py is covered by test_quickstart_reaches_goal (runs it and
    # checks output) — not repeated here to avoid a duplicate solve.
    "mpc_fleet.py",
    "rocket_socp.py",
    "dircol.py",
    "internal_api.py",
    "hybrid_ascent.py",
]
HEAVY = ["quadrotor.py", "cartpole.py"]


def _run(name, timeout=900):
    env = dict(os.environ)
    # Keep the axon site hook (CLAUDE.md) but make sure the repo resolves.
    existing = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + existing if existing else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, (
        f"{name} exited {proc.returncode}\n--- stdout ---\n{proc.stdout}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


@pytest.mark.parametrize("name", LIGHT)
def test_example_runs(name):
    _run(name)


def test_quickstart_reaches_goal():
    out = _run("quickstart.py")
    # "goal error: <value>" — the solved trajectory must actually land on
    # the goal (quickstart.jl solves to constraint tolerance).
    line = next(ln for ln in out.splitlines() if "goal error" in ln)
    assert float(line.split(":")[1]) < 1e-3, line


@pytest.mark.skipif(
    os.environ.get("RUN_HEAVY_EXAMPLES", "0").lower() not in ("1", "true", "yes"),
                    reason="heavy example solves duplicated by test_golden/"
                           "test_solve; set RUN_HEAVY_EXAMPLES=1")
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_example_runs(name):
    _run(name)
