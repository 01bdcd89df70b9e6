"""Cost tests — mirrors test/cost_tests.jl: ctor paths, addition,
gradient/Hessian vs closed forms and AD (cost_tests.jl:229-281)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.costs import (
    DiagonalCost, DiagonalQuatCost, LQRCost, QuadraticCost, QuatLQRCost,
)


@pytest.fixture
def dims(rng):
    # Seeded randomized dims like cost_tests.jl:32 (n,m = rand(10:20), rand(5:10))
    return int(rng.integers(10, 21)), int(rng.integers(5, 11))


def test_quadratic_cost_eval_and_expansion(rng, dims):
    n, m = dims
    Q = rng.standard_normal((n, n)); Q = Q @ Q.T + n * np.eye(n)
    R = rng.standard_normal((m, m)); R = R @ R.T + m * np.eye(m)
    H = rng.standard_normal((m, n))
    q = rng.standard_normal(n); r = rng.standard_normal(m); c = rng.standard_normal()
    cost = QuadraticCost.create(Q, R, H=H, q=q, r=r, c=c)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    J = 0.5 * x @ Q @ x + 0.5 * u @ R @ u + u @ H @ x + q @ x + r @ u + c
    assert float(cost.stage_cost(x, u)) == pytest.approx(float(J))

    e = cost.expansion(x, u)
    gx = jax.grad(lambda x: cost.stage_cost(x, u))(x)
    gu = jax.grad(lambda u: cost.stage_cost(x, u))(u)
    assert np.allclose(e.x, gx) and np.allclose(e.u, gu)
    assert np.allclose(e.xx, jax.hessian(lambda x: cost.stage_cost(x, u))(x))
    assert np.allclose(e.uu, jax.hessian(lambda u: cost.stage_cost(x, u))(u))
    assert np.allclose(e.ux, jax.jacfwd(jax.grad(
        lambda u, x: cost.stage_cost(x, u)), argnums=1)(u, x))
    # terminal drops control terms (cost_functions.jl:92,141)
    assert float(cost.term_cost(x)) == pytest.approx(
        float(0.5 * x @ Q @ x + q @ x + c))
    et = cost.term_expansion(x)
    assert np.allclose(et.u, 0) and np.allclose(et.uu, 0) and np.allclose(et.ux, 0)


def test_diagonal_cost_matches_dense(rng, dims):
    n, m = dims
    Qd = rng.random(n) + 0.1; Rd = rng.random(m) + 0.1
    q = rng.standard_normal(n); r = rng.standard_normal(m)
    dc = DiagonalCost.create(Qd, Rd, q=q, r=r, c=0.3)
    qc = QuadraticCost.create(np.diag(Qd), np.diag(Rd), q=q, r=r, c=0.3)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert float(dc.stage_cost(x, u)) == pytest.approx(float(qc.stage_cost(x, u)))
    e1, e2 = dc.expansion(x, u), qc.expansion(x, u)
    for f in ("x", "u", "xx", "uu", "ux"):
        assert np.allclose(getattr(e1, f), getattr(e2, f))


def test_lqr_cost(rng, dims):
    # LQRCost = 1/2 (x-xf)'Q(x-xf) + 1/2 (u-uf)'R(u-uf) (cost_functions.jl:532-547)
    n, m = dims
    Q = rng.random(n) + 0.1; R = rng.random(m) + 0.1
    xf = rng.standard_normal(n); uf = rng.standard_normal(m)
    cost = LQRCost(Q, R, xf, uf=uf)
    assert isinstance(cost, DiagonalCost)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    expect = 0.5 * (x - xf) @ (Q * (x - xf)) + 0.5 * (u - uf) @ (R * (u - uf))
    assert float(cost.stage_cost(x, u)) == pytest.approx(float(expect))
    # zero at the reference point
    assert float(cost.stage_cost(jnp.asarray(xf), jnp.asarray(uf))) == pytest.approx(0.0, abs=1e-9)
    # dense path
    cost_d = LQRCost(np.diag(Q), np.diag(R), xf, uf=uf)
    assert isinstance(cost_d, QuadraticCost)
    assert float(cost_d.stage_cost(x, u)) == pytest.approx(float(expect))


def test_cost_addition(rng, dims):
    # cost_functions.jl:260-270
    n, m = dims
    c1 = LQRCost(rng.random(n), rng.random(m), rng.standard_normal(n))
    c2 = LQRCost(rng.random(n), rng.random(m), rng.standard_normal(n))
    c3 = c1 + c2
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert float(c3.stage_cost(x, u)) == pytest.approx(
        float(c1.stage_cost(x, u)) + float(c2.stage_cost(x, u)))


def test_quat_cost_gradient_sign(rng):
    """DiagonalQuatCost geodesic term w*min(1 +- qf'q) with sign-aware
    gradient (lie_costs.jl:68-95) vs AD on both sign branches."""
    n, m = 13, 4
    Qd = rng.random(n) * 0.01; Rd = rng.random(m) * 0.01
    xf = rng.standard_normal(n)
    qf = rng.standard_normal(4); qf = qf / np.linalg.norm(qf)
    xf[3:7] = qf
    cost = QuatLQRCost(Qd, Rd, xf, w=2.5)
    u = jnp.asarray(rng.standard_normal(m))

    for sign in (+1, -1):
        x = rng.standard_normal(n)
        q = sign * qf + 0.3 * rng.standard_normal(4)
        x[3:7] = q / np.linalg.norm(q)
        x = jnp.asarray(x)
        e = cost.expansion(x, u)
        gx = jax.grad(lambda x: cost.stage_cost(x, u))(x)
        gu = jax.grad(lambda u: cost.stage_cost(x, u))(u)
        assert np.allclose(e.x, gx, atol=1e-9)
        assert np.allclose(e.u, gu, atol=1e-9)


def test_quat_cost_addition(rng):
    n, m = 13, 4
    c1 = QuatLQRCost(rng.random(n), rng.random(m), rng.standard_normal(n), w=1.0)
    c2 = LQRCost(rng.random(n), rng.random(m), rng.standard_normal(n))
    c3 = c1 + c2
    assert isinstance(c3, DiagonalQuatCost)
    x = jnp.asarray(rng.standard_normal(n)); u = jnp.asarray(rng.standard_normal(m))
    assert float(c3.stage_cost(x, u)) == pytest.approx(
        float(c1.stage_cost(x, u)) + float(c2.stage_cost(x, u)))


def test_cost_change_dimension():
    """Embedding identity (cost_functions.jl:391, lie_costs.jl:144): the
    embedded cost evaluates identically on the embedded state/control."""
    import jax.numpy as jnp
    from trajopt_tpu.costs import change_dimension

    rng = np.random.default_rng(3)
    x, u = rng.standard_normal(4), rng.standard_normal(2)
    ix, iu = [1, 2, 4, 5], [0, 2]
    X = jnp.zeros(6).at[jnp.array(ix)].set(x)
    U = jnp.zeros(3).at[jnp.array(iu)].set(u)

    dc = DiagonalCost.create(rng.random(4) + 1, rng.random(2) + 1,
                             q=rng.standard_normal(4),
                             r=rng.standard_normal(2), c=0.3)
    dc2 = change_dimension(dc, 6, 3, ix=ix, iu=iu)
    assert np.isclose(float(dc.stage_cost(jnp.asarray(x), jnp.asarray(u))),
                      float(dc2.stage_cost(X, U)))
    assert np.isclose(float(dc.term_cost(jnp.asarray(x))),
                      float(dc2.term_cost(X)))

    Qm = rng.standard_normal((4, 4)); Qm = Qm @ Qm.T + 4 * np.eye(4)
    Rm = rng.standard_normal((2, 2)); Rm = Rm @ Rm.T + 2 * np.eye(2)
    qc = QuadraticCost.create(Qm, Rm, H=rng.standard_normal((2, 4)),
                              q=rng.standard_normal(4),
                              r=rng.standard_normal(2), c=-0.1)
    qc2 = change_dimension(qc, 6, 3, ix=ix, iu=iu)
    assert np.isclose(float(qc.stage_cost(jnp.asarray(x), jnp.asarray(u))),
                      float(qc2.stage_cost(X, U)))

    # quaternion cost: q_ind remaps through ix
    xf = np.zeros(13); xf[3] = 1.0
    quat = QuatLQRCost(np.ones(13), np.ones(4), xf, w=0.5)
    big = change_dimension(quat, 15, 5, ix=list(range(2, 15)),
                           iu=list(range(4)))
    assert big.q_ind == (5, 6, 7, 8)
    xq = rng.standard_normal(13)
    xq[3:7] /= np.linalg.norm(xq[3:7])
    Xq = jnp.zeros(15).at[jnp.arange(2, 15)].set(xq)
    Uq = jnp.zeros(5).at[jnp.arange(4)].set(rng.standard_normal(4))
    assert np.isclose(
        float(quat.stage_cost(jnp.asarray(xq), Uq[:4])),
        float(big.stage_cost(Xq, Uq)))


def test_error_quadratic_addition_guards(rng):
    """ADVICE r1: EQ+EQ must validate x_ref/model; change_dimension must
    reject non-leading ix/iu rather than silently ignore them; q_ind is
    stored and drives the quadratic-addition row drop."""
    from trajopt_tpu.costs import ErrorQuadratic, change_dimension
    from trajopt_tpu.models import Quadrotor

    model = Quadrotor()
    x_ref = np.asarray(Quadrotor.build_state([1.0, 2.0, 3.0]))
    eq = ErrorQuadratic.create(model, np.ones(12), 0.1 * np.ones(4), x_ref)
    assert eq.q_ind == (3, 4, 5, 6)

    # same-reference EQ+EQ sums coefficients
    both = eq + eq
    x = np.asarray(Quadrotor.build_state([1.1, 2.0, 2.9]))
    u = jnp.asarray(rng.standard_normal(4))
    assert float(both.stage_cost(jnp.asarray(x), u)) == pytest.approx(
        2 * float(eq.stage_cost(jnp.asarray(x), u)), rel=1e-6)

    # different-reference EQ+EQ must raise (host-side x_ref)
    x_ref2 = np.asarray(Quadrotor.build_state([9.0, 9.0, 9.0]))
    eq2 = ErrorQuadratic.create(model, np.ones(12), 0.1 * np.ones(4), x_ref2)
    with pytest.raises(ValueError):
        eq + eq2

    # different model must raise (equal-parameter models are fine)
    eq3 = ErrorQuadratic.create(Quadrotor(mass=0.7), np.ones(12),
                                0.1 * np.ones(4), x_ref)
    with pytest.raises(ValueError):
        eq + eq3

    # change_dimension: leading-block growth works, non-leading ix raises
    grown = change_dimension(eq, 15, 5)
    X = jnp.concatenate([jnp.asarray(x), jnp.zeros(2)])
    U = jnp.concatenate([u, jnp.zeros(1)])
    assert float(grown.stage_cost(X, U)) == pytest.approx(
        float(eq.stage_cost(jnp.asarray(x), u)), rel=1e-6)
    with pytest.raises(ValueError):
        change_dimension(eq, 15, 5, ix=list(range(2, 15)))

    # quadratic addition with q != 0 must raise (host-side coefficients)
    bad = DiagonalCost.create(np.ones(13), np.ones(4), q=np.ones(13))
    with pytest.raises(ValueError):
        eq + bad


def test_diagonal_lie_cost_ctor_paths(rng):
    """Constructor semantics from the legacy quatcosts.jl:17-48."""
    from trajopt_tpu.costs import DiagonalLieCost

    # LieState(QuatRotation, 3, 6): pos(3), quat(4), vel+omega(6) -> n=13.
    quat_inds = ((3, 4, 5, 6),)
    Qs = [rng.random(3), rng.random(6)]
    Qcat = np.concatenate(Qs)
    R = rng.random(4)
    # Vector-parts Q with explicit n: w defaults to 1 (quatcosts.jl:20-23).
    dcost = DiagonalLieCost.create(Qcat, R, quat_inds=quat_inds, n=13)
    assert np.allclose(np.asarray(dcost.w), [1.0])
    assert np.allclose(np.asarray(dcost.Qv), Qcat)
    assert dcost.n == 13 and dcost.m == 4
    assert dcost.vec_inds == (0, 1, 2, 7, 8, 9, 10, 11, 12)

    # Full-state Q/q: quat entries dropped, w = sum of dropped diagonal
    # (quatcosts.jl:38-45).
    Qfull = rng.random(13)
    qfull = rng.random(13)
    dcost = DiagonalLieCost.create(Qfull, R, q=qfull, quat_inds=quat_inds)
    vec = np.r_[0:3, 7:13]
    assert np.allclose(np.asarray(dcost.Qv), Qfull[vec])
    assert np.allclose(np.asarray(dcost.qv), qfull[vec])
    assert np.isclose(float(dcost.w[0]), Qfull[3:7].sum())

    # Explicit w overrides the sum default (quatcosts.jl:47-48).
    dcost = DiagonalLieCost.create(Qfull, R, q=qfull, w=[6.0],
                                   quat_inds=quat_inds)
    assert float(dcost.w[0]) == 6.0

    with pytest.raises(ValueError):
        DiagonalLieCost.create(rng.random(5), R, quat_inds=quat_inds, n=13)
    with pytest.raises(ValueError):
        DiagonalLieCost.create(Qfull, R, quat_inds=((3, 4, 5, 6),
                                                    (5, 6, 7, 8)))


def test_diagonal_lie_cost_stage_cost_and_gradient(rng):
    """Stage cost vs the hand-written formula (quatcosts.jl:66-80) and
    sign-aware gradient vs AD on both geodesic branches."""
    from trajopt_tpu.costs import DiagonalLieCost

    n, m = 13, 4
    quat_inds = ((3, 4, 5, 6),)
    Q = rng.random(n - 4)
    R = rng.random(m)
    q = rng.random(n - 4)
    r = rng.random(m)
    c = float(rng.random())
    w = rng.random(1)
    qref = rng.standard_normal(4)
    qref /= np.linalg.norm(qref)
    cost = DiagonalLieCost.create(Q, R, q=q, r=r, c=c, w=w, q_refs=qref,
                                  quat_inds=quat_inds, n=n)

    x = rng.standard_normal(n)
    x[3:7] /= np.linalg.norm(x[3:7])
    u = rng.standard_normal(m)
    vec = np.r_[0:3, 7:13]
    xv = x[vec]
    dq = float(qref @ x[3:7])
    Jv = 0.5 * xv @ (Q * xv) + q @ xv + c
    Jr = float(w[0]) * min(1 - dq, 1 + dq)
    Ju = 0.5 * u @ (R * u) + r @ u
    assert np.isclose(float(cost.term_cost(jnp.asarray(x))), Jv + Jr)
    assert np.isclose(float(cost.stage_cost(jnp.asarray(x), jnp.asarray(u))),
                      Jv + Jr + Ju)

    # Gradient vs AD, both signs of q'qref (lie_costs.jl:84-89 behavior).
    for flip in (1.0, -1.0):
        xs = x.copy()
        xs[3:7] *= flip
        g = np.asarray(cost._grad_x(jnp.asarray(xs)))
        g_ad = np.asarray(jax.grad(cost.term_cost)(jnp.asarray(xs)))
        assert np.allclose(g, g_ad, atol=1e-10)
    e = cost.expansion(jnp.asarray(x), jnp.asarray(u))
    assert np.allclose(np.asarray(e.uu), np.diag(R))
    hd = np.diag(np.asarray(e.xx))
    assert np.allclose(hd[vec], Q) and np.allclose(hd[3:7], 0.0)


def test_diagonal_lie_cost_multi_rotation(rng):
    """Two rotation blocks (LieState with num_rotations=2) sum their
    geodesic terms independently."""
    from trajopt_tpu.costs import DiagonalLieCost

    n = 17
    quat_inds = ((3, 4, 5, 6), (10, 11, 12, 13))
    Q = rng.random(n)
    R = rng.random(2)
    qrefs = rng.standard_normal((2, 4))
    qrefs /= np.linalg.norm(qrefs, axis=1, keepdims=True)
    cost = DiagonalLieCost.create(Q, R, q_refs=qrefs, quat_inds=quat_inds)
    assert np.isclose(float(cost.w[0]), Q[3:7].sum())
    assert np.isclose(float(cost.w[1]), Q[10:14].sum())

    x = rng.standard_normal(n)
    for b in quat_inds:
        x[list(b)] /= np.linalg.norm(x[list(b)])
    geo = sum(float(cost.w[i]) * min(1 - d, 1 + d)
              for i, d in enumerate(
                  float(qrefs[i] @ x[list(b)])
                  for i, b in enumerate(quat_inds)))
    vec = [i for i in range(n) if i not in {3, 4, 5, 6, 10, 11, 12, 13}]
    Jv = 0.5 * x[vec] @ (Q[vec] * x[vec])
    assert np.isclose(float(cost.term_cost(jnp.asarray(x))), Jv + geo)
    g = np.asarray(cost._grad_x(jnp.asarray(x)))
    g_ad = np.asarray(jax.grad(cost.term_cost)(jnp.asarray(x)))
    assert np.allclose(g, g_ad, atol=1e-10)


def test_not_psd_warning(rng, dims):
    """Constructor-time definiteness warnings (cost_functions.jl:437-444):
    fire for concrete indefinite Q/R, silent for PSD inputs."""
    import warnings

    n, m = dims
    Qbad = np.eye(n)
    Qbad[0, 0] = -1.0
    with pytest.warns(UserWarning, match="Q is not positive semidefinite"):
        QuadraticCost.create(Qbad, np.eye(m))
    with pytest.warns(UserWarning, match="R is not positive semidefinite"):
        DiagonalCost.create(np.ones(n), -np.ones(m))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        QuadraticCost.create(np.eye(n), np.eye(m))
        DiagonalCost.create(np.ones(n), np.ones(m))


def test_invert_hessian(rng, dims):
    """Structure-aware cost-Hessian inverse (cost_functions.jl:278-297
    invert!): diagonal, block-diagonal, and Schur (cross-term) paths all
    match the dense inverse of [[Q, H'], [H, R]]."""
    from trajopt_tpu.costs import invert

    n, m = dims
    Qd = 0.5 + np.abs(rng.standard_normal(n))
    Rd = 0.5 + np.abs(rng.standard_normal(m))
    dc = DiagonalCost.create(Qd, Rd)
    G = np.block([[np.diag(Qd), np.zeros((n, m))],
                  [np.zeros((m, n)), np.diag(Rd)]])
    assert np.allclose(np.asarray(invert(dc)), np.linalg.inv(G), atol=1e-10)
    # terminal: control rows/cols zeroed, state block = Q^{-1}
    Gt = np.asarray(invert(dc, terminal=True))
    assert np.allclose(Gt[:n, :n], np.diag(1.0 / Qd))
    assert np.allclose(Gt[n:, :], 0.0) and np.allclose(Gt[:, n:], 0.0)
    # block-diagonal dense
    A = rng.standard_normal((n, n))
    Q = A @ A.T + n * np.eye(n)
    Bm = rng.standard_normal((m, m))
    R = Bm @ Bm.T + m * np.eye(m)
    qc = QuadraticCost.create(Q, R)
    G = np.block([[Q, np.zeros((n, m))], [np.zeros((m, n)), R]])
    assert np.allclose(np.asarray(invert(qc)), np.linalg.inv(G), atol=1e-8)
    # cross term -> Schur path
    H = 0.1 * rng.standard_normal((m, n))
    qc = QuadraticCost.create(Q, R, H=H)
    G = np.block([[Q, H.T], [H, R]])
    assert np.allclose(np.asarray(invert(qc)), np.linalg.inv(G), atol=1e-8)
