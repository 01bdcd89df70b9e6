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
