"""Cone tests — mirrors test/cone_tests.jl + test/socp.jl:84-163:
closed-form cases for all three SOC regimes, derivatives vs AD oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import cones
from trajopt_tpu.cones import Cone


def _soc_cases(rng):
    v = jnp.asarray(rng.random(4))
    s = float(jnp.linalg.norm(v))
    inside = jnp.concatenate([v, jnp.array([s + 0.1])])
    outside = jnp.concatenate([v, jnp.array([s - 0.1])])
    below = jnp.concatenate([v, jnp.array([-s - 0.1])])
    return v, s, inside, outside, below


def test_soc_projection_closed_form(rng):
    # socp.jl:89-107
    v, s, inside, outside, below = _soc_cases(rng)
    assert np.allclose(cones.projection(Cone.SECOND_ORDER, inside), inside)
    a = jnp.linalg.norm(v)
    expected = 0.5 * (1 + (s - 0.1) / a) * jnp.concatenate([v, a[None]])
    assert np.allclose(cones.projection(Cone.SECOND_ORDER, outside), expected)
    assert np.allclose(cones.projection(Cone.SECOND_ORDER, below), 0.0)


def test_soc_projection_jacobian_vs_ad(rng):
    # cone_tests.jl:25-47 uses ForwardDiff of the reference projection as oracle
    _, _, inside, outside, below = _soc_cases(rng)
    proj = lambda x: cones.projection(Cone.SECOND_ORDER, x)
    for x in (inside, outside, below):
        J_an = cones.projection_jacobian(Cone.SECOND_ORDER, x)
        J_ad = jax.jacfwd(proj)(x)
        assert np.allclose(J_an, J_ad, atol=1e-10)
    assert np.allclose(cones.projection_jacobian(Cone.SECOND_ORDER, inside),
                       np.eye(5))
    assert np.allclose(cones.projection_jacobian(Cone.SECOND_ORDER, below), 0.0)


def test_soc_projection_hessian_vs_ad(rng):
    _, _, inside, outside, below = _soc_cases(rng)
    b = jnp.asarray(rng.standard_normal(5))
    f = lambda x: cones.projection(Cone.SECOND_ORDER, x) @ b
    for x in (inside, outside, below):
        H_an = cones.projection_hessian(Cone.SECOND_ORDER, x, b)
        H_ad = jax.hessian(f)(x)
        assert np.allclose(H_an, H_ad, atol=1e-10)


def test_orthant_ops(rng):
    x = jnp.asarray(rng.standard_normal(6))
    assert np.allclose(cones.projection(Cone.NEGATIVE_ORTHANT, x), np.minimum(0, x))
    assert np.allclose(cones.projection(Cone.POSITIVE_ORTHANT, x), np.maximum(0, x))
    assert np.allclose(cones.projection(Cone.ZERO, x), 0.0)
    assert np.allclose(cones.projection(Cone.IDENTITY, x), x)
    J = cones.projection_jacobian(Cone.NEGATIVE_ORTHANT, x)
    J_ad = jax.jacfwd(lambda y: cones.projection(Cone.NEGATIVE_ORTHANT, y))(x)
    assert np.allclose(J, J_ad)


def test_dualcone():
    # cones.jl:65-69
    assert cones.dualcone(Cone.ZERO) is Cone.IDENTITY
    assert cones.dualcone(Cone.IDENTITY) is Cone.ZERO
    assert cones.dualcone(Cone.NEGATIVE_ORTHANT) is Cone.NEGATIVE_ORTHANT
    assert cones.dualcone(Cone.POSITIVE_ORTHANT) is Cone.POSITIVE_ORTHANT
    assert cones.dualcone(Cone.SECOND_ORDER) is Cone.SECOND_ORDER


def test_in_cone_and_violation(rng):
    _, _, inside, outside, below = _soc_cases(rng)
    assert bool(cones.in_cone(Cone.SECOND_ORDER, inside))
    assert not bool(cones.in_cone(Cone.SECOND_ORDER, outside))
    assert float(cones.violation(Cone.SECOND_ORDER, inside)) == 0.0
    assert float(cones.violation(Cone.SECOND_ORDER, outside)) > 0.0
    x = jnp.array([-1.0, 0.5])
    assert float(cones.violation(Cone.NEGATIVE_ORTHANT, x)) == pytest.approx(0.5)
    assert float(cones.violation(Cone.ZERO, x)) == pytest.approx(1.0)


def test_cone_status():
    """cone_status regime labels (cones.jl:278-291)."""
    import numpy as np
    from trajopt_tpu import SecondOrderCone, Inequality, cone_status

    v = np.array([3.0, 4.0])  # ||v|| = 5
    assert cone_status(SecondOrderCone, np.append(v, -6.0)) == "below"
    assert cone_status(SecondOrderCone, np.append(v, 6.0)) == "in"
    assert cone_status(SecondOrderCone, np.append(v, 1.0)) == "outside"
    assert cone_status(Inequality, np.array([-1.0, -2.0])) == "in"
    assert cone_status(Inequality, np.array([-1.0, 2.0])) == "outside"
