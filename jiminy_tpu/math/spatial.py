"""6-D spatial algebra (Featherstone) over (rotation, translation) pairs.

Spatial motion vectors are ``(angular ω, linear v)`` stacked as shape (6,)
with angular first; spatial force vectors are ``(couple n, force f)``.
Transforms are stored as ``Transform(rot, pos)`` — the pose of a child frame
C in a parent frame A: a point transforms as ``x_A = rot @ x_C + pos``.

Keeping (R, p) instead of 6×6 Plücker matrices costs fewer FLOPs and maps
better onto the TPU VPU once batched with ``vmap`` (SURVEY.md §2.7 item 1).
This module is the foundation of the rigid-body algorithms that replace the
reference's Pinocchio dependency (SURVEY.md §1 layer L0/L1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.math import so3


def mm3(A: jax.Array, B: jax.Array) -> jax.Array:
    """3×3 · 3×3 in explicit component form. Under ``vmap`` each product
    becomes a wide elementwise VPU op; XLA's batched ``dot_general`` for
    tiny matrices is ~6× slower on TPU (measured at batch 4096)."""
    rows = [
        jnp.stack(
            [
                A[i, 0] * B[0, j] + A[i, 1] * B[1, j] + A[i, 2] * B[2, j]
                for j in range(3)
            ]
        )
        for i in range(3)
    ]
    return jnp.stack(rows)


def mm_at_b(A: jax.Array, B: jax.Array) -> jax.Array:
    """Aᵀ·B for small (k, m)/(k, n) matrices via outer-product accumulation
    (elementwise under vmap — same rationale as :func:`mm3`)."""
    k = A.shape[0]
    return sum(A[i][:, None] * B[i][None, :] for i in range(k))


def mm_outer(A: jax.Array, B: jax.Array) -> jax.Array:
    """A·B for small matrices via Σₖ A[:,k]⊗B[k,:] outer products."""
    k = A.shape[1]
    return sum(A[:, i][:, None] * B[i][None, :] for i in range(k))


def mm3_bt(A: jax.Array, B: jax.Array) -> jax.Array:
    """A · Bᵀ for 3×3 matrices, component form (see :func:`mm3`)."""
    rows = [
        jnp.stack(
            [
                A[i, 0] * B[j, 0] + A[i, 1] * B[j, 1] + A[i, 2] * B[j, 2]
                for j in range(3)
            ]
        )
        for i in range(3)
    ]
    return jnp.stack(rows)


class Transform(struct.PyTreeNode):
    """Pose of a frame C expressed in a frame A.

    Attributes:
      rot: (3, 3) rotation matrix mapping C-coordinates to A-coordinates.
      pos: (3,) origin of C expressed in A.
    """

    rot: jax.Array
    pos: jax.Array

    @staticmethod
    def identity(dtype=jnp.float32) -> "Transform":
        return Transform(rot=jnp.eye(3, dtype=dtype), pos=jnp.zeros(3, dtype=dtype))

    @staticmethod
    def from_quat_pos(quat: jax.Array, pos: jax.Array) -> "Transform":
        return Transform(rot=so3.quat_to_matrix(quat), pos=pos)

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other: if self = pose of B in A and other = pose of C in B,
        the result is the pose of C in A."""
        return Transform(
            rot=mm3(self.rot, other.rot),
            pos=self.rot @ other.pos + self.pos,
        )

    def inverse(self) -> "Transform":
        rot_t = self.rot.T
        return Transform(rot=rot_t, pos=-(rot_t @ self.pos))

    def apply(self, point: jax.Array) -> jax.Array:
        """Transform a point from C-coordinates to A-coordinates."""
        return self.rot @ point + self.pos

    def apply_inv(self, point: jax.Array) -> jax.Array:
        return self.rot.T @ (point - self.pos)

    # --- spatial vector transforms ------------------------------------
    # Motion/force vectors are expressed *in the frame and at the origin*
    # of the frame they are attached to.

    def motion_child_to_parent(self, m: jax.Array) -> jax.Array:
        """Map a spatial motion expressed in C (at C's origin) to one
        expressed in A (at A's origin)."""
        w = self.rot @ m[:3]
        v = self.rot @ m[3:] + jnp.cross(self.pos, w)
        return jnp.concatenate([w, v])

    def motion_parent_to_child(self, m: jax.Array) -> jax.Array:
        """Map a spatial motion expressed in A (at A's origin) to one
        expressed in C (at C's origin)."""
        w = self.rot.T @ m[:3]
        v = self.rot.T @ (m[3:] - jnp.cross(self.pos, m[:3]))
        return jnp.concatenate([w, v])

    def force_child_to_parent(self, f: jax.Array) -> jax.Array:
        """Map a spatial force expressed in C (at C's origin) to one
        expressed in A (at A's origin)."""
        lin = self.rot @ f[3:]
        ang = self.rot @ f[:3] + jnp.cross(self.pos, lin)
        return jnp.concatenate([ang, lin])

    def force_parent_to_child(self, f: jax.Array) -> jax.Array:
        lin = self.rot.T @ (f[3:])
        ang = self.rot.T @ (f[:3] - jnp.cross(self.pos, f[3:]))
        return jnp.concatenate([ang, lin])


def motion_cross(m: jax.Array, other: jax.Array) -> jax.Array:
    """Spatial motion cross product  m ×ₘ other  (both motions)."""
    w, v = m[:3], m[3:]
    ow, ov = other[:3], other[3:]
    return jnp.concatenate([jnp.cross(w, ow), jnp.cross(w, ov) + jnp.cross(v, ow)])


def motion_cross_force(m: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial motion-force cross product  m ×* f ."""
    w, v = m[:3], m[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)])


class SpatialInertia(struct.PyTreeNode):
    """Rigid-body spatial inertia about the body-frame origin.

    Stored as (mass, h = m·c, I) where c is the CoM in body frame and I is
    the 3×3 rotational inertia about the body-frame origin (NOT about the
    CoM). This is the compact 10-parameter form; applying it to a motion
    costs ~30 FLOPs vs 36 for a dense 6×6 (reference: Pinocchio's Inertia;
    SURVEY.md §2.1 "Pinocchio overloads")."""

    mass: jax.Array  # ()
    h: jax.Array  # (3,)  first moment m·c
    inertia: jax.Array  # (3, 3) about body origin

    @staticmethod
    def from_params(mass, com, inertia_at_com) -> "SpatialInertia":
        """Build from mass, CoM offset and rotational inertia about the CoM
        (the URDF parameterization): parallel-axis to the body origin."""
        mass = jnp.asarray(mass)
        com = jnp.asarray(com)
        ic = jnp.asarray(inertia_at_com)
        ch = so3.hat(com)
        io = ic + mass * (ch @ ch.T)
        return SpatialInertia(mass=mass, h=mass * com, inertia=io)

    def mul_motion(self, m: jax.Array) -> jax.Array:
        """f = I·m (spatial momentum / force from motion)."""
        w, v = m[:3], m[3:]
        ang = self.inertia @ w + jnp.cross(self.h, v)
        lin = self.mass * v - jnp.cross(self.h, w)
        return jnp.concatenate([ang, lin])

    def to_matrix(self) -> jax.Array:
        """Dense 6×6 spatial inertia [[I, hx], [hxᵀ, m·1]]."""
        hx = so3.hat(self.h)
        eye = jnp.eye(3, dtype=self.inertia.dtype)
        top = jnp.concatenate([self.inertia, hx], axis=1)
        bot = jnp.concatenate([hx.T, self.mass * eye], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def add(self, other: "SpatialInertia") -> "SpatialInertia":
        return SpatialInertia(
            mass=self.mass + other.mass,
            h=self.h + other.h,
            inertia=self.inertia + other.inertia,
        )

    def transform_by(self, x: "Transform") -> "SpatialInertia":
        """Express this inertia (given in frame C) in the parent frame A,
        where ``x`` is the pose of C in A:  I_A = X I_C X⁻¹ in Plücker terms.
        """
        R, p = x.rot, x.pos
        m = self.mass
        rh = R @ self.h
        h_a = rh + m * p
        ph = so3.hat(p)
        i_a = (
            mm3_bt(mm3(R, self.inertia), R)
            + mm3_bt(ph, so3.hat(rh))
            + mm3_bt(so3.hat(rh + m * p), ph)
        )
        return SpatialInertia(mass=m, h=h_a, inertia=i_a)


def transform_matrix_motion(x: Transform) -> jax.Array:
    """Dense 6×6 Plücker motion transform of ``x`` (child→parent).

    Used only where a dense operator is genuinely needed (e.g. ABA's
    articulated-inertia propagation)."""
    R = x.rot
    pR = so3.hat(x.pos) @ R
    z = jnp.zeros_like(R)
    return jnp.block([[R, z], [pR, R]])
