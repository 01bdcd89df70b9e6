"""Constraint tests — mirrors test/constraint_tests.jl: every constraint's
evaluate/jacobian vs closed form and the AD oracle, dims, sense, bounds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import cones
from trajopt_tpu.cones import Cone
from trajopt_tpu.constraints import (
    BoundConstraint, CircleConstraint, CollisionConstraint, ControlBound,
    GoalConstraint, IndexedConstraint, LinearConstraint, NormConstraint,
    QuatVecEq, SphereConstraint, StateBound,
)


def _check_jacobian(con, x, u, atol=1e-9):
    J = con.jacobian(x, u)
    Jx = jax.jacfwd(lambda x: con.evaluate(x, u))(x)
    Ju = jax.jacfwd(lambda u: con.evaluate(x, u))(u)
    J_ad = jnp.concatenate([Jx, Ju], axis=-1)
    assert np.allclose(J, J_ad, atol=atol), f"{type(con).__name__} jacobian mismatch"
    return J


def test_goal_constraint(rng):
    # constraint_tests.jl:17-39
    n, m = 5, 2
    xf = rng.standard_normal(n)
    con = GoalConstraint.create(xf, m=m)
    assert con.con_label(0) == "index 0"  # generic fallback (abstract_constraint.jl:151)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert np.allclose(con.evaluate(x, u), x - xf)
    assert con.sense is Cone.ZERO and con.is_bound
    assert con.output_dim == n
    _check_jacobian(con, x, u)
    # partial indices
    con2 = GoalConstraint.create(xf, inds=[0, 2], m=m)
    assert con2.output_dim == 2
    assert np.allclose(con2.evaluate(x, u), x[jnp.array([0, 2])] - xf[[0, 2]])
    _check_jacobian(con2, x, u)
    # MPC retarget (constraints.jl:79-87)
    xf2 = rng.standard_normal(n)
    con3 = con2.set_goal_state(xf2)
    assert np.allclose(con3.evaluate(x, u), x[jnp.array([0, 2])] - xf2[[0, 2]])


def test_linear_constraint(rng):
    # constraint_tests.jl:43-92
    n, m, p = 4, 2, 3
    A = rng.standard_normal((p, n + m)); b = rng.standard_normal(p)
    con = LinearConstraint.create(n, m, A, b, sense=Cone.NEGATIVE_ORTHANT)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    z = jnp.concatenate([x, u])
    assert np.allclose(con.evaluate(x, u), A @ z - b)
    _check_jacobian(con, x, u)
    # restricted indices
    con2 = LinearConstraint.create(n, m, A[:, :n], b, sense=Cone.ZERO, inds=range(n))
    assert np.allclose(con2.evaluate(x, u), A[:, :n] @ x - b)
    _check_jacobian(con2, x, u)


def test_circle_sphere_collision(rng):
    # constraint_tests.jl:96-151
    n, m = 4, 2
    xc, yc, r = rng.random(3), rng.random(3), rng.random(3) + 0.1
    con = CircleConstraint.create(n, xc, yc, r, m=m)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    expect = r**2 - (x[0] - xc) ** 2 - (x[1] - yc) ** 2
    assert np.allclose(con.evaluate(x, u), expect)
    assert con.sense is Cone.NEGATIVE_ORTHANT
    _check_jacobian(con, x, u)

    n = 6
    x = jnp.asarray(rng.standard_normal(n))
    zc = rng.random(3)
    con = SphereConstraint.create(n, xc, yc, zc, r, m=m)
    expect = r**2 - (x[0]-xc)**2 - (x[1]-yc)**2 - (x[2]-zc)**2
    assert np.allclose(con.evaluate(x, u), expect)
    _check_jacobian(con, x, u)

    con = CollisionConstraint.create(n, [0, 1], [3, 4], 0.5, m=m)
    d = x[jnp.array([0, 1])] - x[jnp.array([3, 4])]
    assert np.allclose(con.evaluate(x, u), 0.25 - d @ d)
    _check_jacobian(con, x, u)


def test_norm_constraint(rng):
    # constraint_tests.jl:178-205 + socp.jl:165-192
    n, m, val = 3, 2, 4.2
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    con = NormConstraint.create(n, m, val, Cone.NEGATIVE_ORTHANT, "control")
    assert con.output_dim == 1
    assert np.allclose(con.evaluate(x, u), u @ u - val**2)
    _check_jacobian(con, x, u)

    soc = NormConstraint.create(n, m, val, Cone.SECOND_ORDER, "control")
    assert soc.output_dim == m + 1  # [u; val] (constraints.jl:477-500)
    assert np.allclose(soc.evaluate(x, u), jnp.concatenate([u, jnp.array([val])]))
    J = soc.jacobian(x, u)
    expect = np.zeros((m + 1, n + m))
    expect[:m, n:] = np.eye(m)
    assert np.allclose(J, expect)  # socp.jl:187
    assert soc.sense is Cone.SECOND_ORDER
    assert soc.kind == "control"


def test_bound_constraint(rng):
    # constraint_tests.jl:209-266: upper rows then lower rows over finite inds
    n, m = 3, 2
    con = BoundConstraint.create(n, m, x_min=[-1, -np.inf, -3], x_max=[1, 2, np.inf],
                                 u_min=-2, u_max=2)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    z = jnp.concatenate([x, u])
    v = con.evaluate(x, u)
    # finite upper: z0-1, z1-2, u0-2, u1-2 ; finite lower: -1-z0, -3-z2, -2-u0, -2-u1
    expect = jnp.concatenate([
        jnp.array([z[0] - 1, z[1] - 2, z[3] - 2, z[4] - 2]),
        jnp.array([-1 - z[0], -3 - z[2], -2 - z[3], -2 - z[4]]),
    ])
    assert np.allclose(v, expect)
    assert con.output_dim == 8
    assert con.is_bound
    _check_jacobian(con, x, u)
    # bounds vectors for direct solvers
    assert np.allclose(con.lower_bound(), [-1, -np.inf, -3, -2, -2])
    assert np.allclose(con.upper_bound(), [1, 2, np.inf, 2, 2])
    # invalid bounds raise (checkBounds, constraints.jl:708-719)
    with pytest.raises(ValueError):
        BoundConstraint.create(n, m, x_min=1, x_max=-1)
    # row labels: upper rows then lower rows (con_label, constraints.jl:689-706)
    assert [con.con_label(i) for i in range(con.output_dim)] == [
        "x max 0", "x max 1", "u max 0", "u max 1",
        "x min 0", "x min 2", "u min 0", "u min 1",
    ]
    with pytest.raises(IndexError):
        con.con_label(8)


def test_state_control_bounds(rng):
    n, m = 3, 2
    sb = StateBound(n, m, x_min=-1, x_max=1)
    cb = ControlBound(n, m, u_min=-2, u_max=2)
    assert sb.kind == "state" and cb.kind == "control"
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert sb.output_dim == 2 * n and cb.output_dim == 2 * m
    _check_jacobian(sb, x, u)
    _check_jacobian(cb, x, u)


def test_indexed_constraint(rng):
    # constraint_tests.jl:349-409: re-index into an augmented space
    n0, m0 = 3, 2
    n, m = 7, 4
    xf = rng.standard_normal(n0)
    inner = GoalConstraint.create(xf, m=m0)
    con = IndexedConstraint.create(n, m, inner, ix=[2, 3, 4], iu=[1, 2])
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert np.allclose(con.evaluate(x, u), x[jnp.array([2, 3, 4])] - xf)
    assert con.sense is Cone.ZERO
    _check_jacobian(con, x, u)


def test_quat_vec_eq(rng):
    # constraint_tests.jl:412-445: sign-corrected, validated against AD
    n, m = 13, 4
    qf = rng.standard_normal(4); qf = qf / np.linalg.norm(qf)
    con = QuatVecEq(qf=jnp.asarray(qf), n=n, m=m)
    assert con.output_dim == 3 and con.sense is Cone.ZERO
    for sign in (+1, -1):
        x = rng.standard_normal(n)
        q = sign * qf + 0.1 * rng.standard_normal(4)
        x[3:7] = q
        x = jnp.asarray(x)
        u = jnp.asarray(rng.standard_normal(m))
        qn = x[3:7] / jnp.linalg.norm(x[3:7])
        qf_s = qf if float(qf @ qn) >= 0 else -qf
        assert np.allclose(con.evaluate(x, u), -(qf_s[1:] - qn[1:]), atol=1e-12)
        _check_jacobian(con, x, u)
    # exact match: zero residual
    x = rng.standard_normal(n); x[3:7] = -qf  # sign flip is the same rotation
    assert np.allclose(con.evaluate(jnp.asarray(x), u), 0, atol=1e-12)


def test_state_only_constraint_solves():
    """A constraint built WITHOUT the m= embed (the reference's natural
    StateConstraint signature, e.g. CircleConstraint(n, xc, yc, r)) has a
    narrow (p, n) Jacobian; full_width_jacobian pads it so the AL expansion,
    projected Newton, and NLP rows all consume it (regression: previously
    broke make_al_functions' g_z[:, n:] split)."""
    import trajopt_tpu as to
    from trajopt_tpu.models import DoubleIntegrator
    from trajopt_tpu.solvers import ALTROSolver, SolverOptions

    model = DoubleIntegrator()
    n, m, N, tf = 4, 2, 21, 2.0
    xf = jnp.array([1.0, 1.0, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), 0.1 * jnp.ones(m), 100.0 * jnp.ones(n),
                          xf, N)
    cons = to.ConstraintList(n, m, N)
    circle = to.CircleConstraint.create(n, [0.5], [0.5], [0.2])  # no m=
    assert circle.jacobian(jnp.zeros(n), jnp.zeros(m)).shape == (1, n)
    from trajopt_tpu.constraints import full_width_jacobian
    J = full_width_jacobian(circle, jnp.full(n, 0.3), jnp.zeros(m))
    assert J.shape == (1, n + m) and np.allclose(J[:, n:], 0.0)
    cons = to.add_constraint(cons, circle, range(1, N - 1))
    cons = to.add_constraint(cons, to.GoalConstraint.create(xf, m=m), [N - 1])
    prob = to.Problem(model, obj, jnp.zeros(n), tf, xf=xf, constraints=cons)
    sol = ALTROSolver(prob, SolverOptions(projected_newton=True)).solve()
    assert bool(sol.converged)
    d = jnp.sqrt((sol.xs[1:-1, 0] - 0.5) ** 2 + (sol.xs[1:-1, 1] - 0.5) ** 2)
    assert float(d.min()) > 0.2 - 1e-5
    assert float(jnp.linalg.norm(sol.xs[-1] - xf)) < 1e-5

    # NLP Jacobian rows agree with whole-vector AD through eval_c
    # (rollout first: default states are NaN-filled like the reference, and
    # NaN primals poison structurally-zero AD-oracle entries)
    nlp = to.TrajOptNLP(prob.rollout())
    Z = nlp.initial_trajectory() + 0.01
    Jd = nlp.jac_c_dense(Z)
    Jad = jax.jacfwd(nlp.eval_c)(Z)
    assert np.allclose(Jd, Jad, atol=1e-8)


def test_jacobian_fd_matches_ad(rng):
    # DiffMethod=FiniteDifference analog (src/TrajectoryOptimization.jl:23,
    # constraint_list.jl:40-41); FD-vs-AD oracle technique of
    # constraint_tests.jl:437-445.
    n, m = 5, 2
    con = CircleConstraint.create(n, [0.5, -0.2], [0.1, 0.4], [0.3, 0.2], m=m)
    x = jnp.asarray(rng.standard_normal(n))
    u = jnp.asarray(rng.standard_normal(m))
    J_ad = jnp.concatenate(
        [jax.jacfwd(con.evaluate, argnums=0)(x, u),
         jax.jacfwd(con.evaluate, argnums=1)(x, u)], axis=-1)
    assert np.allclose(con.jacobian_fd(x, u), J_ad, atol=1e-6)

    qf = rng.standard_normal(4); qf /= np.linalg.norm(qf)
    qcon = QuatVecEq(qf=jnp.asarray(qf), n=13, m=4)
    xq = jnp.asarray(rng.standard_normal(13))
    uq = jnp.asarray(rng.standard_normal(4))
    J_ad = jnp.concatenate(
        [jax.jacfwd(qcon.evaluate, argnums=0)(xq, uq),
         jax.jacfwd(qcon.evaluate, argnums=1)(xq, uq)], axis=-1)
    assert np.allclose(qcon.jacobian_fd(xq, uq), J_ad, atol=1e-6)


def test_fd_diff_method_solve():
    # A solve with diff_method="fd" constraints matches the AD solve
    # (per-constraint DiffMethod selection, constraint_list.jl:103-106).
    import trajopt_tpu as to
    from trajopt_tpu.models import DoubleIntegrator
    from trajopt_tpu.solvers import ALTROSolver, SolverOptions

    model = DoubleIntegrator(d=2)
    n, m, N, tf = 4, 2, 21, 2.0
    # asymmetric goal/obstacle: a symmetric layout has two mirror optima and
    # FD rounding can break the tie differently from AD
    xf = jnp.array([1.0, 0.6, 0.0, 0.0])
    obj = to.LQRObjective(jnp.ones(n), 0.1 * jnp.ones(m), 10.0 * jnp.ones(n),
                          xf, N)

    def build(diff):
        cons = to.ConstraintList(n, m, N)
        cons.add_constraint(
            to.CircleConstraint.create(n, [0.5], [0.25], [0.2], m=m),
            range(1, N - 1), diff_method=diff)
        cons.add_constraint(to.GoalConstraint.create(xf, m=m), [N - 1])
        assert cons.diffs == [diff, "ad"]
        prob = to.Problem(model, obj, jnp.zeros(n), tf, xf=xf,
                          constraints=cons)
        return ALTROSolver(prob, SolverOptions()).solve()

    sol_fd = build("fd")
    sol_ad = build("ad")
    assert bool(sol_fd.converged)
    assert np.allclose(sol_fd.us, sol_ad.us, atol=1e-5)
    with pytest.raises(ValueError):
        to.ConstraintList(n, m, N).add_constraint(
            to.GoalConstraint.create(xf, m=m), [N - 1], diff_method="bogus")
