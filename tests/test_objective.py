"""Objective tests — mirrors test/objective_tests.jl: construction, total
cost vs explicit sum (objective_tests.jl:124-141), tracking/MPC updates."""
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.costs import LQRCost
from trajopt_tpu.objective import (
    LQRObjective, Objective, TrackingObjective, update_trajectory,
)


def test_lqr_objective_cost_sum(rng):
    n, m, N = 4, 2, 11
    Q = rng.random(n); R = rng.random(m); Qf = rng.random(n) * 10
    xf = rng.standard_normal(n)
    obj = LQRObjective(Q, R, Qf, xf, N)
    xs = jnp.asarray(rng.standard_normal((N, n)))
    us = jnp.asarray(rng.standard_normal((N, m)))
    J = float(obj.cost(xs, us))
    Jman = sum(
        0.5 * (xs[k] - xf) @ (Q * (xs[k] - xf)) + 0.5 * us[k] @ (R * us[k])
        for k in range(N - 1)
    )
    Jman += 0.5 * (xs[-1] - xf) @ (Qf * (xs[-1] - xf))
    assert J == pytest.approx(float(Jman))
    # per-knot vector get_J (objective.jl:104-106)
    Jvec = obj.get_J(xs, us)
    assert Jvec.shape == (N,)
    assert float(jnp.sum(Jvec)) == pytest.approx(J)


def test_objective_from_cost_broadcast(rng):
    n, m, N = 3, 2, 7
    cost = LQRCost(rng.random(n), rng.random(m), rng.standard_normal(n))
    obj = Objective.from_cost(cost, N)
    assert obj.N == N
    xs = jnp.asarray(rng.standard_normal((N, n)))
    us = jnp.asarray(rng.standard_normal((N, m)))
    expect = sum(float(cost.stage_cost(xs[k], us[k])) for k in range(N - 1))
    expect += float(cost.term_cost(xs[-1]))
    assert float(obj.cost(xs, us)) == pytest.approx(expect)


def test_objective_expansion_terminal_masked(rng):
    n, m, N = 4, 2, 6
    obj = LQRObjective(rng.random(n), rng.random(m), rng.random(n), rng.standard_normal(n), N)
    xs = jnp.asarray(rng.standard_normal((N, n)))
    us = jnp.asarray(rng.standard_normal((N, m)))
    e = obj.expansion(xs, us)
    assert e.x.shape == (N, n) and e.uu.shape == (N, m, m)
    assert np.allclose(e.u[-1], 0) and np.allclose(e.uu[-1], 0)
    assert not np.allclose(e.uu[0], 0)


def test_tracking_objective_and_update(rng):
    # objective.jl:190-212: per-knot LQR tracking + receding-horizon retarget
    n, m, N = 3, 2, 9
    Q = rng.random(n) + 0.1; R = rng.random(m) + 0.1
    Xr = rng.standard_normal((N, n)); Ur = rng.standard_normal((N, m))
    obj = TrackingObjective(Q, R, Xr, Ur)
    # zero cost on the reference trajectory (except terminal control drop)
    J = obj.cost(jnp.asarray(Xr), jnp.asarray(Ur))
    assert float(J) == pytest.approx(0.0, abs=1e-9)
    # retarget to a new reference
    Xr2 = rng.standard_normal((N, n)); Ur2 = rng.standard_normal((N, m))
    obj2 = update_trajectory(obj, Xr2, Ur2)
    assert float(obj2.cost(jnp.asarray(Xr2), jnp.asarray(Ur2))) == pytest.approx(0.0, abs=1e-9)
    assert float(obj2.cost(jnp.asarray(Xr), jnp.asarray(Ur))) > 1e-3


def test_per_cost_diff_methods():
    """Per-knot DiffMethod selection (objective.jl:32-34): mixed
    analytic/ForwardAD/FiniteDifference engines agree on a quadratic
    objective's expansion; an iLQR solve under each engine lands on the
    same optimum."""
    import trajopt_tpu as to
    from trajopt_tpu.models import DoubleIntegrator
    from trajopt_tpu.solvers import SolverOptions, iLQRSolver

    rng = np.random.default_rng(11)
    n, m, N = 4, 2, 9
    xf = jnp.asarray(rng.standard_normal(n))
    obj = to.LQRObjective(jnp.ones(n) + 1, jnp.ones(m), 5 * jnp.ones(n), xf, N)
    xs = jnp.asarray(rng.standard_normal((N, n)))
    us = jnp.asarray(rng.standard_normal((N, m)))
    base = obj.expansion(xs, us)

    mixed = obj.with_diff_methods(
        ("analytic", "ad", "fd") * (N // 3))
    assert mixed.diff_methods is not None
    got = mixed.expansion(xs, us)
    for name in ("xx", "uu", "ux", "x", "u", "c"):
        assert np.allclose(getattr(got, name), getattr(base, name),
                           atol=1e-6), name

    # uniform "analytic" normalizes back to the fast path
    assert obj.with_diff_methods("analytic").diff_methods is None
    with pytest.raises(ValueError):
        obj.with_diff_methods("nope")
    with pytest.raises(ValueError):
        obj.with_diff_methods(("ad",) * (N - 1))

    # end-to-end: an AD-engine objective solves identically
    model = DoubleIntegrator(d=2)
    prob = to.Problem(model, obj.with_diff_methods("ad"), jnp.zeros(n), 2.0,
                      xf=xf)
    sol_ad = iLQRSolver(prob).solve()
    prob2 = to.Problem(model, obj, jnp.zeros(n), 2.0, xf=xf)
    sol = iLQRSolver(prob2).solve()
    assert bool(sol_ad.converged)
    assert np.allclose(np.asarray(sol_ad.us), np.asarray(sol.us), atol=1e-8)
