"""Parallel (associative-scan) Riccati — exact equivalence with the
sequential backward pass, and end-to-end solves with riccati='parallel'."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trajopt_tpu as to
from trajopt_tpu.models import Cartpole
from trajopt_tpu.solvers import ALTROSolver, SolverOptions
from trajopt_tpu.solvers.parallel_riccati import parallel_riccati_gains


def _random_lqr(rng, T, n, m):
    A = jnp.asarray(rng.standard_normal((T, n, n)) * 0.3 + np.eye(n))
    B = jnp.asarray(rng.standard_normal((T, n, m)) * 0.2)

    def spd(k, d, scale):
        M = rng.standard_normal((k, d, d))
        return jnp.asarray(np.einsum("kij,klj->kil", M, M) + d * np.eye(d)) * scale

    return (A, B, spd(T + 1, n, 0.1), spd(T, m, 0.5),
            jnp.asarray(rng.standard_normal((T, m, n)) * 0.05),
            jnp.asarray(rng.standard_normal((T + 1, n))),
            jnp.asarray(rng.standard_normal((T, m))))


def _sequential(A, B, lxx, luu, lux, lx, lu):
    T, n, m = B.shape
    Vx, Vxx = np.asarray(lx[-1]), np.asarray(lxx[-1])
    Ks, ds = [], []
    dV1 = dV2 = 0.0
    for k in reversed(range(T)):
        Qx = lx[k] + A[k].T @ Vx
        Qu = lu[k] + B[k].T @ Vx
        Qxx = lxx[k] + A[k].T @ Vxx @ A[k]
        Quu = luu[k] + B[k].T @ Vxx @ B[k]
        Qux = lux[k] + B[k].T @ Vxx @ A[k]
        K = -np.linalg.solve(Quu, Qux)
        d = -np.linalg.solve(Quu, Qu)
        Vx = np.asarray(Qx + K.T @ Quu @ d + K.T @ Qu + Qux.T @ d)
        Vxx = np.asarray(Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K)
        Vxx = 0.5 * (Vxx + Vxx.T)
        dV1 += float(d @ Qu)
        dV2 += float(0.5 * d @ Quu @ d)
        Ks.append(np.asarray(K))
        ds.append(np.asarray(d))
    return np.array(Ks[::-1]), np.array(ds[::-1]), dV1, dV2


@pytest.mark.parametrize("T,n,m", [(12, 5, 3), (33, 4, 1), (101, 13, 4)])
def test_matches_sequential(rng, T, n, m):
    data = _random_lqr(rng, T, n, m)
    K_s, d_s, dV1_s, dV2_s = _sequential(*data)
    K_p, d_p, dV1_p, dV2_p, fail = parallel_riccati_gains(*data, jnp.zeros(()))
    assert not bool(fail)
    assert np.allclose(K_p, K_s, atol=1e-9)
    assert np.allclose(d_p, d_s, atol=1e-9)
    assert float(dV1_p) == pytest.approx(dV1_s, abs=1e-9)
    assert float(dV2_p) == pytest.approx(dV2_s, abs=1e-9)


def test_cartpole_solve_parallel_riccati():
    """Full AL-iLQR solve with the parallel backward pass."""
    model = Cartpole()
    n, m, N, tf = 4, 1, 101, 5.0
    xf = jnp.array([0.0, jnp.pi, 0.0, 0.0])
    obj = to.LQRObjective(1e-2 * jnp.ones(n), 1e-1 * jnp.ones(m),
                          100.0 * jnp.ones(n), xf, N)
    cons = to.ConstraintList(n, m, N)
    cons.add_constraint(to.BoundConstraint.create(n, m, u_min=-3.0, u_max=3.0),
                        range(N - 1))
    cons.add_constraint(to.GoalConstraint.create(xf, m=m), N - 1)
    prob = to.Problem(model, obj, jnp.zeros(4), tf, xf=xf, constraints=cons)
    prob.initial_controls(jnp.full((N - 1, m), 0.01))
    solver = ALTROSolver(prob, SolverOptions(cost_tolerance_intermediate=1e-2,
                                             riccati="parallel"))
    sol = solver.solve()
    assert bool(sol.converged)
    assert solver.max_violation() < 1e-6
    assert abs(float(sol.xs[-1, 1]) - np.pi) < 1e-6
