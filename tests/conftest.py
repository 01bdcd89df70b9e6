"""Test configuration: CPU backend (8 virtual devices for mesh tests) + f64.

The reference validates against f64 closed forms (SURVEY.md §4); we run the
test suite on the CPU backend with x64 enabled, and reserve
bf16/f32-on-real-TPU for the benchmark path (SURVEY.md §7 'dual precision
modes').  Must run before any other jax usage, hence the module-level
config updates here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1)


# ---------------------------------------------------------------------------
# Fast tier (`pytest -m fast`): the <5-min every-commit gate — unit layers,
# the quickstart/Dubins end-to-end solves, and the retrace guards.  The full
# suite (~30 min) stays the round gate, mirroring the reference's cheap vs
# gated split (test/runtests.jl:17).
# ---------------------------------------------------------------------------
_FAST_MODULES = {
    "test_costs", "test_cones", "test_constraints", "test_constraint_list",
    "test_objective", "test_trajectories", "test_problem", "test_retrace",
    "test_hybrid",
}
_FAST_TESTS = {
    "test_quickstart_solve",
    "test_dubins_parallel_park_matches_reference_optimum",
    "test_quickstart_reaches_goal",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        if item.module.__name__ in _FAST_MODULES or name in _FAST_TESTS:
            item.add_marker(pytest.mark.fast)
