"""Spatial algebra unit tests: transforms vs dense 6×6 Plücker matrices."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.math import so3
from jiminy_tpu.math.spatial import (
    SpatialInertia,
    Transform,
    motion_cross,
    motion_cross_force,
    transform_matrix_motion,
)


def random_transform(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = so3.quat_normalize(jax.random.normal(k1, (4,)))
    p = jax.random.normal(k2, (3,))
    return Transform(rot=so3.quat_to_matrix(q), pos=p)


def test_compose_inverse():
    x = random_transform(0)
    y = x.compose(x.inverse())
    np.testing.assert_allclose(y.rot, jnp.eye(3), atol=1e-5)
    np.testing.assert_allclose(y.pos, jnp.zeros(3), atol=1e-5)


def test_motion_transform_matches_dense():
    x = random_transform(1)
    m = jax.random.normal(jax.random.PRNGKey(2), (6,))
    X = transform_matrix_motion(x)
    np.testing.assert_allclose(x.motion_child_to_parent(m), X @ m, atol=1e-5)
    np.testing.assert_allclose(
        x.motion_parent_to_child(x.motion_child_to_parent(m)), m, atol=1e-5
    )


def test_force_transform_is_dual():
    # power invariance: f·m must be frame-independent
    x = random_transform(3)
    m = jax.random.normal(jax.random.PRNGKey(4), (6,))
    f = jax.random.normal(jax.random.PRNGKey(5), (6,))
    p1 = jnp.dot(f, m)
    p2 = jnp.dot(x.force_child_to_parent(f), x.motion_child_to_parent(m))
    np.testing.assert_allclose(p1, p2, atol=1e-4)
    np.testing.assert_allclose(
        x.force_parent_to_child(x.force_child_to_parent(f)), f, atol=1e-5
    )


def test_motion_cross_products():
    m1 = jax.random.normal(jax.random.PRNGKey(6), (6,))
    m2 = jax.random.normal(jax.random.PRNGKey(7), (6,))
    f = jax.random.normal(jax.random.PRNGKey(8), (6,))
    # duality: (m1 ×ₘ m2)·f = -m2·(m1 ×* f)
    lhs = jnp.dot(motion_cross(m1, m2), f)
    rhs = -jnp.dot(m2, motion_cross_force(m1, f))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_inertia_apply_matches_dense():
    I = SpatialInertia.from_params(
        2.5, jnp.array([0.1, -0.2, 0.3]), jnp.diag(jnp.array([0.2, 0.3, 0.4]))
    )
    m = jax.random.normal(jax.random.PRNGKey(9), (6,))
    np.testing.assert_allclose(I.mul_motion(m), I.to_matrix() @ m, atol=1e-5)


def test_inertia_transform_matches_dense():
    I = SpatialInertia.from_params(
        1.7, jnp.array([0.05, 0.1, -0.02]), jnp.diag(jnp.array([0.1, 0.12, 0.08]))
    )
    x = random_transform(10)
    I_parent = I.transform_by(x)
    # dense check: I_A = W I_C Wᵀ with W the force transform child→parent
    Xm = transform_matrix_motion(x)
    W = jnp.linalg.inv(Xm).T
    np.testing.assert_allclose(
        I_parent.to_matrix(), W @ I.to_matrix() @ W.T, atol=1e-4
    )


def test_kinetic_energy_invariance():
    # ½ mᵀ I m must be invariant under change of frame
    I = SpatialInertia.from_params(
        3.0, jnp.array([0.0, 0.1, 0.2]), jnp.diag(jnp.array([0.3, 0.2, 0.25]))
    )
    m = jax.random.normal(jax.random.PRNGKey(11), (6,))
    x = random_transform(12)
    e1 = 0.5 * jnp.dot(m, I.mul_motion(m))
    m_a = x.motion_child_to_parent(m)
    e2 = 0.5 * jnp.dot(m_a, I.transform_by(x).mul_motion(m_a))
    np.testing.assert_allclose(e1, e2, atol=1e-4)
