"""Problem tests — mirrors test/problems_tests.jl: ctor variants, uneven dt,
NaN defaults, setters, MPC mutation semantics; plus the quickstart cost and
rollout identities (examples/quickstart.jl:72-96)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import DoubleIntegrator


def _prob(N=11, tf=2.0, **kw):
    model = DoubleIntegrator(d=2)
    xf = jnp.array([0.0, 2.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(4), jnp.ones(2), 10 * jnp.ones(4), xf, N)
    return to.Problem(model, obj, jnp.zeros(4), tf, xf=xf, **kw), xf


def test_defaults():
    prob, xf = _prob()
    # NaN-filled default states (problems_tests.jl:92-99), zero controls
    assert bool(jnp.all(jnp.isnan(prob.states(1))))
    assert np.allclose(prob.controls(), 0.0)
    assert prob.horizonlength() == 11
    assert prob.tf == pytest.approx(2.0)
    assert np.allclose(prob.gettimes(), np.linspace(0, 2.0, 11))
    assert prob.num_constraints().sum() == 0


def test_uneven_dt():
    # problems_tests.jl:79-85
    dts = np.array([0.1, 0.2, 0.3, 0.2, 0.1, 0.1, 0.2, 0.3, 0.2, 0.1])
    prob, _ = _prob(N=11, tf=None, dt=dts)
    assert np.allclose(prob.gettimes(), np.concatenate([[0], np.cumsum(dts)]))
    assert prob.dts[-1] == 0.0
    with pytest.raises(ValueError):
        _prob(N=11, tf=None, dt=dts[:5])


def test_initial_setters(rng):
    prob, _ = _prob()
    U0 = rng.standard_normal((10, 2))
    prob.initial_controls(U0)
    assert np.allclose(prob.controls(), U0)
    X0 = rng.standard_normal((11, 4))
    prob.initial_states(X0)
    assert np.allclose(prob.states(), X0)
    # single control broadcast
    prob.initial_controls(jnp.array([0.1, -0.2]))
    assert np.allclose(prob.controls(), np.tile([0.1, -0.2], (10, 1)))


def test_quickstart_cost_and_rollout_identity(rng):
    # quickstart.jl:72-96
    prob, xf = _prob()
    N, n, m = 11, 4, 2
    U0 = rng.standard_normal((N - 1, m))
    X0 = np.zeros((N, n))
    prob.initial_controls(U0).initial_states(X0)
    J = float(prob.cost())
    Jman = sum(0.5 * xf @ xf + 0.5 * U0[k] @ U0[k] for k in range(N - 1))
    Jman += 0.5 * (10 * xf) @ xf
    assert J == pytest.approx(float(Jman))
    prob.rollout()
    x = prob.x0
    for k in range(N - 1):
        x = prob.model.step(x, prob.us[k], prob.times[k], prob.dts[k])
    assert np.allclose(prob.xs[-1], x, atol=1e-12)


def test_set_initial_and_goal_state(rng):
    cons = to.ConstraintList(4, 2, 11)
    xf0 = jnp.array([0.0, 2.0, 0.0, 0.0])
    cons.add_constraint(to.GoalConstraint.create(xf0, m=2), 10)
    prob, xf = _prob(constraints=cons)
    x0n = jnp.asarray(rng.standard_normal(4))
    prob.set_initial_state(x0n)
    assert np.allclose(prob.x0, x0n)
    # set_goal_state retargets objective + GoalConstraint + xf (problem.jl:294-310)
    xfn = jnp.asarray(rng.standard_normal(4))
    prob.set_goal_state(xfn)
    assert np.allclose(prob.xf, xfn)
    x = jnp.asarray(rng.standard_normal(4))
    u = jnp.zeros(2)
    # stage cost is now quadratic about the new goal
    assert float(prob.obj.cost_at(0).stage_cost(xfn, u)) == pytest.approx(0.0, abs=1e-9)
    assert np.allclose(prob.constraints[0].evaluate(x, u), x - xfn)
    # time shift (problem.jl:280-284)
    prob.set_initial_time(1.5)
    assert prob.gettimes()[0] == pytest.approx(1.5)


def test_dim_validation():
    model = DoubleIntegrator(d=2)
    obj = to.LQRObjective(jnp.ones(4), jnp.ones(2), jnp.ones(4), jnp.zeros(4), 11)
    with pytest.raises(ValueError):
        to.Problem(model, obj, jnp.zeros(3), 2.0)  # bad x0
    with pytest.raises(ValueError):
        to.Problem(model, obj, jnp.zeros(4), 2.0, N=12)  # N mismatch
    cons = to.ConstraintList(4, 2, 12)  # wrong N
    with pytest.raises(ValueError):
        to.Problem(model, obj, jnp.zeros(4), 2.0, constraints=cons)
