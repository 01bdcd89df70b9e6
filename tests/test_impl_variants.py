"""Algebra-variant equivalence: the TPU-layout-driven implementations
(riccati_body="mulsum", errstate_impl variants) must be exact reformulations
of the reference algebra — same backward passes, same solves, to f64
rounding (VERDICT r4 #1/#3; measured TPU wins recorded in options.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import benchmarks
from trajopt_tpu.solvers import SolverOptions, solve_problem
from trajopt_tpu.solvers.al import init_duals, make_al_functions
from trajopt_tpu.solvers.altro import _problem_blocks
from trajopt_tpu.solvers.ilqr import _backward_pass

pytestmark = pytest.mark.fast


def _perturbed_quadrotor(N=21):
    prob = benchmarks.quadrotor_zigzag(N=N)
    prob.rollout()
    rng = np.random.default_rng(0)
    xs = np.array(prob.xs) + 0.01 * rng.standard_normal(prob.xs.shape)
    xs[:, 3:7] /= np.linalg.norm(xs[:, 3:7], axis=-1, keepdims=True)
    us = np.array(prob.us) + 0.01 * rng.standard_normal(prob.us.shape)
    return prob, jnp.asarray(xs), jnp.asarray(us)


def _bp(prob, xs, us, **opt_kw):
    opts = SolverOptions(**opt_kw)
    blocks = _problem_blocks(prob)
    lams, mus = init_duals(blocks, opts, xs.dtype)
    _, expand_fn = make_al_functions(prob.obj, blocks, lams, mus)
    return _backward_pass(prob.model, expand_fn, xs, us, prob.times,
                          prob.dts, jnp.zeros(()), jnp.ones(()), opts)


def test_riccati_body_mulsum_matches_matmul():
    prob, xs, us = _perturbed_quadrotor()
    a = _bp(prob, xs, us, riccati_body="matmul")
    b = _bp(prob, xs, us, riccati_body="mulsum")
    np.testing.assert_allclose(np.asarray(a.K), np.asarray(b.K), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.d), np.asarray(b.d), atol=1e-11)
    assert float(a.dV1) == pytest.approx(float(b.dV1), rel=1e-10)


@pytest.mark.parametrize("impl", ["mulsum", "dense_ms"])
def test_errstate_impl_matches_concat(impl):
    prob, xs, us = _perturbed_quadrotor()
    a = _bp(prob, xs, us, errstate_impl="concat", error_state=True)
    b = _bp(prob, xs, us, errstate_impl=impl, error_state=True)
    np.testing.assert_allclose(np.asarray(a.K), np.asarray(b.K), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.d), np.asarray(b.d), atol=1e-11)


def test_full_solve_invariant_to_body():
    prob = benchmarks.dubins_parallel_park(N=51)
    kw = dict(cost_tolerance_intermediate=1e-2)
    a = solve_problem(benchmarks.dubins_parallel_park(N=51),
                      SolverOptions(riccati_body="matmul", **kw))
    b = solve_problem(prob, SolverOptions(riccati_body="mulsum", **kw))
    assert bool(a.converged) and bool(b.converged)
    assert float(a.J) == pytest.approx(float(b.J), rel=1e-9)
    np.testing.assert_allclose(np.asarray(a.us), np.asarray(b.us), atol=1e-9)
