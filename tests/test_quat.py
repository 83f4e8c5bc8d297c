import jax.numpy as jnp
import numpy as np
import pytest

from dem_engine_tpu.ops import quat


def test_identity_rotation():
    q = quat.identity()
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat.rotate(q, v), v, atol=1e-6)


def test_axis_angle_90deg_z():
    q = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.pi / 2)
    v = jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        quat.rotate(q, v), jnp.asarray([0.0, 1.0, 0.0]), atol=1e-6
    )


def test_rotate_inv_roundtrip():
    rng = np.random.default_rng(0)
    axis = rng.normal(size=(16, 3))
    ang = rng.uniform(-np.pi, np.pi, size=16)
    q = quat.from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.asarray(ang, jnp.float32))
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    back = quat.rotate_inv(q, quat.rotate(q, v))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_hamilton_composition():
    qa = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.3)
    qb = quat.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.5)
    v = jnp.asarray([0.2, -0.7, 1.1])
    lhs = quat.rotate(quat.hamilton(qa, qb), v)
    rhs = quat.rotate(qa, quat.rotate(qb, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_integrate_constant_omega():
    # Spin about z at 1 rad/s for 1 s in 1000 steps -> 1 rad total.
    import jax

    omega = jnp.asarray([0.0, 0.0, 1.0])
    h = 1e-3

    def body(q, _):
        return quat.integrate(q, omega, h), None

    q, _ = jax.lax.scan(body, quat.identity(), length=1000)
    expect = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 1.0)
    np.testing.assert_allclose(np.abs(np.dot(np.asarray(q), np.asarray(expect))), 1.0, atol=1e-4)


def test_unit_norm_preserved():
    q = quat.from_axis_angle(jnp.asarray([1.0, 1.0, 0.0]), 0.7)
    q2 = quat.integrate(q, jnp.asarray([10.0, -3.0, 2.0]), 0.01)
    assert abs(float(jnp.linalg.norm(q2)) - 1.0) < 1e-6
