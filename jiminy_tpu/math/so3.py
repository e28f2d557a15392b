"""SO(3) / quaternion operations.

Convention: quaternions are stored **scalar-last** ``(x, y, z, w)``, matching
the layout Jiminy inherits from Pinocchio for free-flyer and spherical joints
in the configuration vector (reference: Pinocchio joint models used by
jiminy's ``Model``; SURVEY.md §2.1 "Model").

All functions are pure, shape-polymorphic over leading batch dimensions only
via ``jax.vmap`` (the functions themselves operate on single quaternions /
matrices), and safe to differentiate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Quaternion layout indices.
QX, QY, QZ, QW = 0, 1, 2, 3


def quat_identity(dtype=jnp.float32) -> jax.Array:
    """Identity rotation ``(0, 0, 0, 1)``."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit quaternion (guarded against zero norm)."""
    n = jnp.sqrt(jnp.sum(q * q) + eps)
    return q / n


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product ``q1 ⊗ q2`` (both scalar-last xyzw)."""
    x1, y1, z1, w1 = q1[QX], q1[QY], q1[QZ], q1[QW]
    x2, y2, z2, w2 = q2[QX], q2[QY], q2[QZ], q2[QW]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (inverse for unit quaternions)."""
    return jnp.stack([-q[QX], -q[QY], -q[QZ], q[QW]])


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate 3-vector ``v`` by unit quaternion ``q`` (frame B→A if q is
    the orientation of B in A). Uses the 2-cross-product formula."""
    u = q[:3]
    w = q[QW]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate ``v`` by the inverse of ``q``."""
    u = -q[:3]
    w = q[QW]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion → 3×3 rotation matrix."""
    x, y, z, w = q[QX], q[QY], q[QZ], q[QW]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array(
        [
            [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
            [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
            [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)],
        ]
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """3×3 rotation matrix → unit quaternion (xyzw), branch-free.

    Uses the 4-candidate construction selected by the largest diagonal
    combination — stable for all rotations and safe under ``vmap``/``jit``
    (no data-dependent Python control flow; SURVEY.md §7 "XLA semantics").
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (un-normalized), one per dominant component.
    qw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr])
    qx = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12])
    qy = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20])
    qz = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01])

    cases = jnp.stack([qx, qy, qz, qw])  # (4, 4) candidate (x,y,z,w) rows
    scores = jnp.stack([m00, m11, m22, tr])
    idx = jnp.argmax(scores)
    q = cases[idx]
    return quat_normalize(q) * jnp.sign(q[QW] + jnp.where(q[QW] == 0.0, 1.0, 0.0))


def quat_exp(w: jax.Array) -> jax.Array:
    """Exponential map: rotation vector (3,) → unit quaternion (xyzw).

    Taylor-guarded near zero so it is differentiable everywhere — this is
    the Lie-group integration primitive used by the steppers (reference:
    ``pinocchio::integrate`` on the quaternion manifold; SURVEY.md §2.1
    "Steppers").
    """
    theta_sq = jnp.sum(w * w)
    theta = jnp.sqrt(theta_sq + 1e-24)
    half = 0.5 * theta
    # sin(x)/x with Taylor fallback.
    small = theta_sq < 1e-14
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    cos_half = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w * sinc_half, cos_half[None]])


def quat_log(q: jax.Array) -> jax.Array:
    """Logarithm map: unit quaternion → rotation vector (3,)."""
    sin_half_sq = jnp.sum(q[:3] * q[:3])
    sin_half = jnp.sqrt(sin_half_sq + 1e-24)
    w = jnp.abs(q[QW])
    vec = jnp.where(q[QW] < 0.0, -q[:3], q[:3])
    angle = 2.0 * jnp.arctan2(sin_half, w)
    small = sin_half_sq < 1e-14
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / sin_half)
    return vec * scale


def log_matrix(R: jax.Array) -> jax.Array:
    """Logarithm map: rotation matrix → rotation vector (3,)."""
    return quat_log(matrix_to_quat(R))


def quat_integrate(q: jax.Array, w_local: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by a body-frame angular velocity over dt:
    ``q_new = q ⊗ exp(w_local · dt)`` (local/right increment, Pinocchio
    convention for spherical and free-flyer joints)."""
    dq = quat_exp(w_local * dt)
    return quat_normalize(quat_mul(q, dq))


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix of 3-vector v."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array([[zero, -z, y], [z, zero, -x], [-y, x, zero]])


def rpy_to_quat(rpy: jax.Array) -> jax.Array:
    """Roll-pitch-yaw (XYZ extrinsic, URDF convention) → quaternion."""
    half = 0.5 * rpy
    cr, cp, cy = jnp.cos(half[0]), jnp.cos(half[1]), jnp.cos(half[2])
    sr, sp, sy = jnp.sin(half[0]), jnp.sin(half[1]), jnp.sin(half[2])
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def quat_to_rpy(q: jax.Array) -> jax.Array:
    """Quaternion → roll-pitch-yaw (XYZ extrinsic)."""
    x, y, z, w = q[QX], q[QY], q[QZ], q[QW]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])
