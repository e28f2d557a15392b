"""Kinematic constraints with Jacobian + Baumgarte, fed to the PGS solver.

Reference: jiminy's ``AbstractConstraintBase`` hierarchy — ``JointConstraint``
(lock a joint), ``FrameConstraint`` (weld a frame), ``DistanceConstraint``
(closed loops, e.g. Cassie pushrods), ``SphereConstraint`` and
``WheelConstraint`` (rolling without slip), each with a per-constraint
Baumgarte stabilization frequency (SURVEY.md §2.1 "Constraints").

Each constraint emits a fixed number of stacked velocity-level rows
``J v⁺ = v_target`` where ``v_target`` carries the Baumgarte position-error
correction. Activity is a dynamic mask so shapes stay static under vmap.
Constraint parameters are pytree leaves, so they may be batched per-env.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, KinematicTree
from jiminy_tpu.math import so3
from jiminy_tpu.engine.solver import BlockSpec


def baumgarte_alpha(freq: jax.Array, dt: float) -> jax.Array:
    """Fraction of the position error corrected per step, clipped for
    stability (α = min(2π·f·dt, 1))."""
    return jnp.clip(2.0 * jnp.pi * freq * dt, 0.0, 1.0)


def tangent_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two unit tangents orthogonal to unit normal n (..., 3)."""
    # pick the world axis least aligned with n to avoid degeneracy
    ref = jnp.where(
        jnp.abs(n[..., 2:3]) < 0.9,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


class ConstraintRows(struct.PyTreeNode):
    """Stacked output of a constraint: J (k, nv), target (k,), active (k,)."""

    J: jax.Array
    target: jax.Array
    active: jax.Array


class FrameConstraint(struct.PyTreeNode):
    """Weld an operational frame to a reference world pose (6 rows:
    [angular; linear]). Reference: jiminy FrameConstraint — used for
    constraint-model contacts and fixed-body setups."""

    frame: int = struct.field(pytree_node=False)
    ref_rot: jax.Array = None  # (3, 3) world target orientation
    ref_pos: jax.Array = None  # (3,) world target position
    baumgarte_freq: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )

    size = 6
    kind = "equality"

    def rows(self, tree, q, v, xw, vel, dt) -> ConstraintRows:
        b = tree.frame_body[self.frame]
        pose = xw[b].compose(tree.frame_placement(self.frame))
        J = algos.frame_jacobian6(tree, xw, b, pose.pos)
        ref_rot = (
            jnp.eye(3, dtype=q.dtype) if self.ref_rot is None else self.ref_rot
        )
        ref_pos = (
            jnp.zeros(3, dtype=q.dtype) if self.ref_pos is None else self.ref_pos
        )
        # world-frame orientation error via the log map, position error direct
        err_rot = so3.log_matrix(pose.rot @ ref_rot.T)
        err_pos = pose.pos - ref_pos
        err = jnp.concatenate([err_rot, err_pos])
        alpha = baumgarte_alpha(self.baumgarte_freq, dt)
        target = -alpha / dt * err
        return ConstraintRows(
            J=J, target=target, active=jnp.ones(6, dtype=bool)
        )


class JointConstraint(struct.PyTreeNode):
    """Lock a 1-DoF joint at a reference position (used by the reference for
    position bounds and fixed joints). 1 row."""

    joint: int = struct.field(pytree_node=False)
    ref_q: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    baumgarte_freq: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )

    size = 1
    kind = "equality"

    def rows(self, tree, q, v, xw, vel, dt) -> ConstraintRows:
        i = self.joint
        assert tree.joint_type[i] in (JointType.REVOLUTE, JointType.PRISMATIC)
        J = jnp.zeros((1, tree.nv), dtype=q.dtype).at[0, tree.v_off[i]].set(1.0)
        err = q[tree.q_off[i]] - self.ref_q
        alpha = baumgarte_alpha(self.baumgarte_freq, dt)
        return ConstraintRows(
            J=J,
            target=(-alpha / dt * err)[None],
            active=jnp.ones(1, dtype=bool),
        )


class DistanceConstraint(struct.PyTreeNode):
    """Keep the distance between two operational frames at ``distance``
    (1 row). Reference: jiminy DistanceConstraint — Cassie's pushrod
    closed loops (SURVEY.md §2.1, §7 hard-parts "Closed kinematic loops")."""

    frame1: int = struct.field(pytree_node=False)
    frame2: int = struct.field(pytree_node=False)
    distance: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    baumgarte_freq: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )

    size = 1
    kind = "equality"

    def rows(self, tree, q, v, xw, vel, dt) -> ConstraintRows:
        b1, b2 = tree.frame_body[self.frame1], tree.frame_body[self.frame2]

        def fpos(b, f):
            # world frames (body -1, e.g. a fused URDF root used as a
            # fixed anchor) are absolute — xw[-1] would silently alias
            # the LAST body and zero the whole constraint
            pl = tree.frame_placement(f)
            if b < 0:
                return pl.pos.astype(q.dtype)
            return xw[b].compose(pl).pos

        p1 = fpos(b1, self.frame1)
        p2 = fpos(b2, self.frame2)
        d_vec = p1 - p2
        d = jnp.linalg.norm(d_vec)
        u = d_vec / jnp.maximum(d, 1e-9)
        J1 = algos.point_jacobian(tree, xw, b1, p1)
        J2 = algos.point_jacobian(tree, xw, b2, p2)
        J = (u @ (J1 - J2))[None, :]
        err = d - self.distance
        alpha = baumgarte_alpha(self.baumgarte_freq, dt)
        return ConstraintRows(
            J=J,
            target=(-alpha / dt * err)[None],
            active=jnp.ones(1, dtype=bool),
        )


class SphereConstraint(struct.PyTreeNode):
    """Sphere of radius r centered at a frame, rolling without slip on the
    ground (3 rows: contact-point velocity = 0, with Baumgarte on
    penetration). Reference: jiminy SphereConstraint."""

    frame: int = struct.field(pytree_node=False)
    radius: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    baumgarte_freq: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )

    size = 3
    kind = "equality"

    def rows(self, tree, q, v, xw, vel, dt, ground=None) -> ConstraintRows:
        b = tree.frame_body[self.frame]
        center = xw[b].compose(tree.frame_placement(self.frame)).pos
        if ground is None:
            h = jnp.zeros((), dtype=q.dtype)
            n = jnp.array([0.0, 0.0, 1.0], dtype=q.dtype)
        else:
            h, n = ground.query(center[:2])
        pc = center - self.radius * n
        J = algos.point_jacobian(tree, xw, b, pc)
        depth = h - pc[2]  # > 0 when penetrating
        alpha = baumgarte_alpha(self.baumgarte_freq, dt)
        target = alpha / dt * depth * n
        return ConstraintRows(
            J=J, target=target, active=jnp.ones(3, dtype=bool)
        )


class WheelConstraint(struct.PyTreeNode):
    """Wheel of radius r about ``axis`` (in the frame), rolling without slip
    (3 rows). The ground contact point is the lowest point of the wheel
    circle along the ground normal. Reference: jiminy WheelConstraint
    (contributed upstream by the fork's author, SURVEY.md provenance)."""

    frame: int = struct.field(pytree_node=False)
    radius: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    axis: jax.Array = struct.field(
        default_factory=lambda: jnp.array([0.0, 1.0, 0.0])
    )
    baumgarte_freq: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )

    size = 3
    kind = "equality"

    def rows(self, tree, q, v, xw, vel, dt, ground=None) -> ConstraintRows:
        b = tree.frame_body[self.frame]
        pose = xw[b].compose(tree.frame_placement(self.frame))
        center = pose.pos
        a_w = pose.rot @ self.axis.astype(q.dtype)  # wheel axis, world
        if ground is None:
            h = jnp.zeros((), dtype=q.dtype)
            n = jnp.array([0.0, 0.0, 1.0], dtype=q.dtype)
        else:
            h, n = ground.query(center[:2])
        # direction in the wheel plane pointing most along -n
        d = -(n - jnp.dot(n, a_w) * a_w)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
        pc = center + self.radius * d
        J = algos.point_jacobian(tree, xw, b, pc)
        depth = h - pc[2]
        alpha = baumgarte_alpha(self.baumgarte_freq, dt)
        target = alpha / dt * depth * n
        return ConstraintRows(
            J=J, target=target, active=jnp.ones(3, dtype=bool)
        )


def assemble(
    tree: KinematicTree,
    constraints,
    q: jax.Array,
    v: jax.Array,
    xw,
    vel,
    dt: float,
    ground=None,
) -> tuple[jax.Array, jax.Array, jax.Array, list[BlockSpec]]:
    """Stack all kinematic-constraint rows. Returns (J, target, active,
    blocks). Contact rows are appended separately by the engine."""
    Js, targets, actives, blocks = [], [], [], []
    off = 0
    for c in constraints:
        if isinstance(c, (SphereConstraint, WheelConstraint)):
            r = c.rows(tree, q, v, xw, vel, dt, ground)
        else:
            r = c.rows(tree, q, v, xw, vel, dt)
        Js.append(r.J)
        targets.append(r.target)
        actives.append(r.active)
        blocks.append(BlockSpec(kind=c.kind, start=off, size=c.size))
        off += c.size
    if not Js:
        z = jnp.zeros((0, tree.nv), dtype=q.dtype)
        return z, jnp.zeros(0, q.dtype), jnp.zeros(0, bool), []
    return (
        jnp.concatenate(Js, axis=0),
        jnp.concatenate(targets, axis=0),
        jnp.concatenate(actives, axis=0),
        blocks,
    )
