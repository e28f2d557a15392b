"""Quaternion/SO(3) unit tests (analytical fixtures, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.math import so3


def random_quat(key):
    q = jax.random.normal(key, (4,))
    return so3.quat_normalize(q)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quat_matrix_roundtrip(seed):
    q = random_quat(jax.random.PRNGKey(seed))
    R = so3.quat_to_matrix(q)
    q2 = so3.matrix_to_quat(R)
    # same rotation up to sign
    d = min(np.abs(np.asarray(q - q2)).max(), np.abs(np.asarray(q + q2)).max())
    assert d < 1e-5


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(3)
    q = random_quat(key)
    v = jax.random.normal(jax.random.PRNGKey(4), (3,))
    np.testing.assert_allclose(
        so3.quat_rotate(q, v), so3.quat_to_matrix(q) @ v, atol=1e-5
    )
    np.testing.assert_allclose(
        so3.quat_rotate_inv(q, v), so3.quat_to_matrix(q).T @ v, atol=1e-5
    )


def test_quat_mul_compose():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    q1, q2 = random_quat(k1), random_quat(k2)
    v = jnp.array([0.3, -1.2, 0.7])
    lhs = so3.quat_rotate(so3.quat_mul(q1, q2), v)
    rhs = so3.quat_rotate(q1, so3.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_exp_log_roundtrip():
    w = jnp.array([0.4, -0.2, 0.9])
    np.testing.assert_allclose(so3.quat_log(so3.quat_exp(w)), w, atol=1e-5)
    # small angle
    w = jnp.array([1e-9, -2e-9, 0.0])
    np.testing.assert_allclose(so3.quat_log(so3.quat_exp(w)), w, atol=1e-12)


def test_exp_known_rotation():
    # 90° about z
    q = so3.quat_exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
    v = so3.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_rpy_roundtrip():
    rpy = jnp.array([0.3, -0.5, 1.1])
    q = so3.rpy_to_quat(rpy)
    np.testing.assert_allclose(so3.quat_to_rpy(q), rpy, atol=1e-5)


def test_quat_integrate_constant_rate():
    # integrating ω for t should equal exp(ω t)
    q0 = so3.quat_identity()
    w = jnp.array([0.0, 0.0, 1.0])
    q = q0
    for _ in range(100):
        q = so3.quat_integrate(q, w, 0.01)
    expected = so3.quat_exp(w * 1.0)
    d = min(np.abs(np.asarray(q - expected)).max(), np.abs(np.asarray(q + expected)).max())
    assert d < 1e-4
