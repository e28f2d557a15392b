"""KinematicTree — the static model pytree, replacing Pinocchio's Model.

Reference equivalent: jiminy's ``Model`` wraps a ``pinocchio::Model`` with
theoretical/extended variants, flexible joints, bounds-as-constraints and
contact frames (SURVEY.md §2.1 "Model"). Here the model is a single frozen
pytree of stacked arrays plus hashable static metadata, so a compiled XLA
program is specialized per robot topology (SURVEY.md §7 hard-parts: "one
compiled program per robot model").

Design notes (TPU-first):
- Topology (parents, joint types, q/v offsets) is static Python data →
  rigid-body algorithms unroll over bodies at trace time; the batch axis is
  added by ``vmap`` and becomes the TPU vector dimension.
- All numeric quantities are stacked ``(nb, ...)`` arrays so the tree is a
  pytree leaf-compatible with ``jit``/``pjit`` donation and sharding.
- Fixed joints are fused at build time (no runtime cost), but their frames
  are preserved as operational frames for sensors/contacts.
"""

from __future__ import annotations

import enum
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.math import so3
from jiminy_tpu.math.spatial import SpatialInertia, Transform


class JointType(enum.IntEnum):
    """Joint models supported by the runtime tree.

    FREE and SPHERICAL use quaternion configuration blocks (xyzw) and
    local-frame tangent velocities, matching the Pinocchio conventions the
    reference inherits (SURVEY.md §2.1 "Steppers": Lie-group integrate)."""

    FREE = 0  # nq=7 [pos(3), quat xyzw], nv=6 [v_lin local, ω local]
    REVOLUTE = 1  # nq=1, nv=1, about `axis`
    PRISMATIC = 2  # nq=1, nv=1, along `axis`
    SPHERICAL = 3  # nq=4 [quat xyzw], nv=3 [ω local]


JOINT_NQ = {
    JointType.FREE: 7,
    JointType.REVOLUTE: 1,
    JointType.PRISMATIC: 1,
    JointType.SPHERICAL: 4,
}
JOINT_NV = {
    JointType.FREE: 6,
    JointType.REVOLUTE: 1,
    JointType.PRISMATIC: 1,
    JointType.SPHERICAL: 3,
}


def _static(default=None):
    return struct.field(pytree_node=False, default=default)


class KinematicTree(struct.PyTreeNode):
    """Frozen robot model. Build via :class:`TreeBuilder` or the URDF loader."""

    # ---- static topology (hashable; specializes the compiled program) ----
    nb: int = _static()  # number of moving bodies (== joints)
    nq: int = _static()
    nv: int = _static()
    parent: tuple = _static()  # (nb,) parent body index, -1 = world
    joint_type: tuple = _static()  # (nb,) JointType
    q_off: tuple = _static()  # (nb,) offset of each joint's q block
    v_off: tuple = _static()  # (nb,) offset of each joint's v block
    body_name: tuple = _static()
    joint_name: tuple = _static()
    # operational frames (fixed frames attached to bodies)
    frame_body: tuple = _static(())  # (nf,) body index per frame
    frame_name: tuple = _static(())
    # contact points: (ncp,) body index per point
    contact_body: tuple = _static(())
    contact_frame_name: tuple = _static(())

    # ---- numeric model data (pytree leaves) ----
    # pose of joint i's reference frame in the parent body frame
    jp_rot: jax.Array = None  # (nb, 3, 3)
    jp_pos: jax.Array = None  # (nb, 3)
    axis: jax.Array = None  # (nb, 3) joint axis (revolute/prismatic; else e_z)
    # body spatial inertia about body frame origin
    inertia_mass: jax.Array = None  # (nb,)
    inertia_h: jax.Array = None  # (nb, 3)  first moment m·c
    inertia_mat: jax.Array = None  # (nb, 3, 3) about origin
    armature: jax.Array = None  # (nv,) rotor inertia added to M diagonal
    damping: jax.Array = None  # (nv,) joint-level viscous damping
    # (nv,) joint-level spring stiffness toward the neutral configuration
    # (quaternion joints: torque −k·log(quat)); carries the reference's
    # flexible-joint stiffness (SURVEY.md §2.1 "Model": flexible joints)
    stiffness: jax.Array = None
    # limits (hardware/bounds; consumed by envs & constraint layer)
    q_min: jax.Array = None  # (nq,)
    q_max: jax.Array = None  # (nq,)
    v_max: jax.Array = None  # (nv,)
    u_max: jax.Array = None  # (nv,)
    gravity: jax.Array = None  # (3,)
    # operational frame placements (in their body frame)
    fp_rot: jax.Array = None  # (nf, 3, 3)
    fp_pos: jax.Array = None  # (nf, 3)
    # contact point positions in body frame
    contact_pos: jax.Array = None  # (ncp, 3)
    # collision-sphere radius per contact site (0 = bare point). A
    # sphere site contacts the ground at center − r·n (surface point,
    # recomputed every substep), which is what makes balls ROLL and
    # capsule feet rock — the primitive-vs-ground analog of the
    # reference's hpp-fcl collision bodies (SURVEY.md §2.1 "Model"),
    # kept analytic so the query stays gather-free inside kernels.
    contact_radius: jax.Array = None  # (ncp,)

    # ---- convenience -------------------------------------------------
    def joint_placement(self, i: int) -> Transform:
        return Transform(rot=self.jp_rot[i], pos=self.jp_pos[i])

    def body_inertia(self, i: int) -> SpatialInertia:
        return SpatialInertia(
            mass=self.inertia_mass[i], h=self.inertia_h[i], inertia=self.inertia_mat[i]
        )

    def frame_placement(self, k: int) -> Transform:
        return Transform(rot=self.fp_rot[k], pos=self.fp_pos[k])

    @property
    def nf(self) -> int:
        return len(self.frame_body)

    @property
    def ncp(self) -> int:
        return len(self.contact_body)

    def frame_index(self, name: str) -> int:
        return self.frame_name.index(name)

    def joint_index(self, name: str) -> int:
        return self.joint_name.index(name)

    def neutral_q(self) -> jax.Array:
        """Neutral configuration: identity quaternions, zeros elsewhere."""
        q = np.zeros(self.nq, dtype=np.float32)
        for i in range(self.nb):
            t = self.joint_type[i]
            off = self.q_off[i]
            if t == JointType.FREE:
                q[off + 6] = 1.0
            elif t == JointType.SPHERICAL:
                q[off + 3] = 1.0
        return jnp.asarray(q)

    def q_slice(self, i: int) -> slice:
        return slice(self.q_off[i], self.q_off[i] + JOINT_NQ[self.joint_type[i]])

    def v_slice(self, i: int) -> slice:
        return slice(self.v_off[i], self.v_off[i] + JOINT_NV[self.joint_type[i]])


def merge_trees(
    trees: Sequence[KinematicTree], prefixes: Sequence[str] | None = None
) -> KinematicTree:
    """Merge robots into one forest tree (multiple parent=-1 roots).

    The reference Engine owns SEVERAL robots in one simulation with
    coupling forces between them (SURVEY.md §2.1 "Engine",
    post-EngineMultiRobot merge). On TPU the natural equivalent is one
    compiled program over the union forest: all rigid-body algorithms here
    already handle multi-root trees. Body/joint/frame names are prefixed
    per robot ("robot0/...", or the given prefixes)."""
    import numpy as onp

    if prefixes is None:
        prefixes = [f"robot{i}/" for i in range(len(trees))]

    def cat(xs, width=None):
        arrs = [onp.asarray(x) for x in xs]
        return jnp.asarray(onp.concatenate(arrs, axis=0))

    parent, jtype, q_off, v_off = [], [], [], []
    body_name, joint_name, frame_body, frame_name = [], [], [], []
    contact_body, contact_frame_name = [], []
    b_off = q_base = v_base = 0
    for t, pre in zip(trees, prefixes):
        parent += [p + b_off if p >= 0 else -1 for p in t.parent]
        jtype += list(t.joint_type)
        q_off += [o + q_base for o in t.q_off]
        v_off += [o + v_base for o in t.v_off]
        body_name += [pre + n for n in t.body_name]
        joint_name += [pre + n for n in t.joint_name]
        frame_body += [b + b_off for b in t.frame_body]
        frame_name += [pre + n for n in t.frame_name]
        contact_body += [b + b_off for b in t.contact_body]
        contact_frame_name += [pre + n for n in t.contact_frame_name]
        b_off += t.nb
        q_base += t.nq
        v_base += t.nv

    return KinematicTree(
        nb=b_off,
        nq=q_base,
        nv=v_base,
        parent=tuple(parent),
        joint_type=tuple(jtype),
        q_off=tuple(q_off),
        v_off=tuple(v_off),
        body_name=tuple(body_name),
        joint_name=tuple(joint_name),
        frame_body=tuple(frame_body),
        frame_name=tuple(frame_name),
        contact_body=tuple(contact_body),
        contact_frame_name=tuple(contact_frame_name),
        jp_rot=cat([t.jp_rot for t in trees]),
        jp_pos=cat([t.jp_pos for t in trees]),
        axis=cat([t.axis for t in trees]),
        inertia_mass=cat([t.inertia_mass for t in trees]),
        inertia_h=cat([t.inertia_h for t in trees]),
        inertia_mat=cat([t.inertia_mat for t in trees]),
        armature=cat([t.armature for t in trees]),
        damping=cat([t.damping for t in trees]),
        stiffness=cat([t.stiffness for t in trees]),
        q_min=cat([t.q_min for t in trees]),
        q_max=cat([t.q_max for t in trees]),
        v_max=cat([t.v_max for t in trees]),
        u_max=cat([t.u_max for t in trees]),
        gravity=trees[0].gravity,
        fp_rot=cat([t.fp_rot for t in trees]),
        fp_pos=cat([t.fp_pos for t in trees]),
        contact_pos=cat([t.contact_pos for t in trees]),
        contact_radius=cat([t.contact_radius for t in trees]),
    )


def map_configuration(
    src: KinematicTree, dst: KinematicTree, q_src: jax.Array
) -> jax.Array:
    """Map a configuration between two trees by JOINT NAME; joints absent
    from ``src`` (e.g. inserted flexibility joints) stay neutral.

    This is the reference's rigid↔flexible state expansion
    (SURVEY.md §3.1: "flexible-model state expansion")."""
    q = dst.neutral_q()
    for j, name in enumerate(dst.joint_name):
        if name not in src.joint_name:
            continue
        i = src.joint_name.index(name)
        q = q.at[dst.q_slice(j)].set(q_src[src.q_slice(i)])
    return q


def map_velocity(
    src: KinematicTree, dst: KinematicTree, v_src: jax.Array
) -> jax.Array:
    """Velocity counterpart of :func:`map_configuration`."""
    v = jnp.zeros(dst.nv, dtype=v_src.dtype)
    for j, name in enumerate(dst.joint_name):
        if name not in src.joint_name:
            continue
        i = src.joint_name.index(name)
        v = v.at[dst.v_slice(j)].set(v_src[src.v_slice(i)])
    return v


class TreeBuilder:
    """Imperative robot-model builder (programmatic equivalent of URDF).

    Fixed joints are fused into the parent body (inertia composition +
    frame bookkeeping), mirroring how the reference's Model reduces the
    pinocchio model (SURVEY.md §2.1 "Model")."""

    def __init__(self, gravity=(0.0, 0.0, -9.81)):
        self._gravity = np.asarray(gravity, dtype=np.float32)
        # per moving body
        self.parent: list[int] = []
        self.joint_type: list[JointType] = []
        self.jp: list[np.ndarray] = []  # 4x4 homogeneous placements
        self.axis: list[np.ndarray] = []
        self.mass: list[float] = []
        self.com: list[np.ndarray] = []
        self.inertia_com: list[np.ndarray] = []
        self.body_name: list[str] = []
        self.joint_name: list[str] = []
        self.armature: list[np.ndarray] = []
        self.damping: list[np.ndarray] = []
        self.stiffness: list[np.ndarray] = []
        self.q_min: list[np.ndarray] = []
        self.q_max: list[np.ndarray] = []
        self.v_max: list[np.ndarray] = []
        self.u_max: list[np.ndarray] = []
        # frames & contacts
        self.frame_body: list[int] = []
        self.frame_name: list[str] = []
        self.fp: list[np.ndarray] = []
        self.contact_body: list[int] = []
        self.contact_pos: list[np.ndarray] = []
        self.contact_radius: list[float] = []
        self.contact_frame_name: list[str] = []

    @staticmethod
    def make_placement(pos=(0, 0, 0), rpy=(0, 0, 0)) -> np.ndarray:
        T = np.eye(4, dtype=np.float32)
        q = np.asarray(so3.rpy_to_quat(jnp.asarray(rpy, dtype=jnp.float32)))
        T[:3, :3] = np.asarray(so3.quat_to_matrix(jnp.asarray(q)))
        T[:3, 3] = np.asarray(pos, dtype=np.float32)
        return T

    def add_body(
        self,
        name: str,
        parent: int,
        joint_type: JointType,
        placement: np.ndarray | None = None,
        axis=(0.0, 0.0, 1.0),
        mass: float = 0.0,
        com=(0.0, 0.0, 0.0),
        inertia=None,
        joint_name: str | None = None,
        armature: float | Sequence[float] = 0.0,
        damping: float | Sequence[float] = 0.0,
        stiffness: float | Sequence[float] = 0.0,
        q_limits=None,
        v_max: float = 1e6,
        u_max: float = 1e6,
    ) -> int:
        """Add a moving body under `parent` (index, -1 for world). Returns
        the new body index."""
        nvj = JOINT_NV[joint_type]
        nqj = JOINT_NQ[joint_type]
        self.parent.append(parent)
        self.joint_type.append(joint_type)
        self.jp.append(np.eye(4, dtype=np.float32) if placement is None else placement)
        ax = np.asarray(axis, dtype=np.float32)
        n = np.linalg.norm(ax)
        self.axis.append(ax / n if n > 0 else np.array([0, 0, 1], np.float32))
        self.mass.append(float(mass))
        self.com.append(np.asarray(com, dtype=np.float32))
        if inertia is None:
            inertia = np.zeros((3, 3), dtype=np.float32)
        inertia = np.asarray(inertia, dtype=np.float32)
        if inertia.shape == (3,):
            inertia = np.diag(inertia)
        self.inertia_com.append(inertia)
        self.body_name.append(name)
        self.joint_name.append(joint_name or f"{name}_joint")
        self.armature.append(np.broadcast_to(np.asarray(armature, np.float32), (nvj,)).copy())
        self.damping.append(np.broadcast_to(np.asarray(damping, np.float32), (nvj,)).copy())
        self.stiffness.append(np.broadcast_to(np.asarray(stiffness, np.float32), (nvj,)).copy())
        if q_limits is None:
            lo = np.full(nqj, -1e6, np.float32)
            hi = np.full(nqj, 1e6, np.float32)
        else:
            lo = np.broadcast_to(np.asarray(q_limits[0], np.float32), (nqj,)).copy()
            hi = np.broadcast_to(np.asarray(q_limits[1], np.float32), (nqj,)).copy()
        # quaternion blocks have no box limits
        if joint_type in (JointType.FREE, JointType.SPHERICAL):
            qs = 3 if joint_type == JointType.FREE else 0
            lo[qs:], hi[qs:] = -1e6, 1e6
        self.q_min.append(lo)
        self.q_max.append(hi)
        self.v_max.append(np.full(nvj, v_max, np.float32))
        self.u_max.append(np.full(nvj, u_max, np.float32))
        return len(self.parent) - 1

    def insert_flexibility(
        self,
        joint_name: str,
        stiffness=100.0,
        damping=1.0,
        inertia=1e-3,
    ) -> int:
        """Insert a 3-DoF SPHERICAL flexibility joint *upstream* of the
        named joint: the flexible body takes over the original joint
        placement and carries a small rotary inertia; a spring-damper
        (``stiffness``/``damping`` per axis) pulls it to identity.

        Reference: jiminy's flexible joints — quaternion-parameterized
        3-DoF rotations inserted at user-listed frames/joints with
        inertia/stiffness/damping (SURVEY.md §2.1 "Model", §7 step 7).
        Returns the index of the inserted body."""
        i = self.joint_name.index(joint_name)
        name = self.body_name[i] + "_flex"

        def bump(idx: int) -> int:
            return idx + 1 if idx >= i else idx

        # shift all body references ≥ i (the new body takes index i)
        self.parent = [bump(p) for p in self.parent]
        self.frame_body = [bump(b) for b in self.frame_body]
        self.contact_body = [bump(b) for b in self.contact_body]

        # the flexible body inherits body i's parent and placement ...
        self.parent.insert(i, self.parent[i])
        self.joint_type.insert(i, JointType.SPHERICAL)
        self.jp.insert(i, self.jp[i])
        self.axis.insert(i, np.array([0, 0, 1], np.float32))
        self.mass.insert(i, 0.0)
        self.com.insert(i, np.zeros(3, np.float32))
        ine = np.broadcast_to(np.asarray(inertia, np.float32), (3,))
        self.inertia_com.insert(i, np.diag(ine).astype(np.float32))
        self.body_name.insert(i, name)
        self.joint_name.insert(i, name + "_joint")
        self.armature.insert(i, np.zeros(3, np.float32))
        self.damping.insert(
            i, np.broadcast_to(np.asarray(damping, np.float32), (3,)).copy()
        )
        self.stiffness.insert(
            i, np.broadcast_to(np.asarray(stiffness, np.float32), (3,)).copy()
        )
        self.q_min.insert(i, np.full(4, -1e6, np.float32))
        self.q_max.insert(i, np.full(4, 1e6, np.float32))
        self.v_max.insert(i, np.full(3, 1e6, np.float32))
        self.u_max.insert(i, np.full(3, 1e6, np.float32))
        # ... while the original body now hangs off the flex body at identity
        self.parent[i + 1] = i
        self.jp[i + 1] = np.eye(4, dtype=np.float32)
        return i

    def insert_backlash(
        self,
        joint_name: str,
        play: float,
        armature: float = 1e-4,
        damping: float = 0.0,
    ) -> int:
        """Insert a passive BACKLASH joint upstream of the named joint: a
        free-moving revolute joint about the same axis, limited to
        ±play/2 (enforced by the bounds-as-constraints rows). Reference:
        jiminy's backlash joints (SURVEY.md §2.1 "Model", upstream ≥1.8).
        ``armature`` gives the otherwise massless DoF inertia for
        stability. Returns the inserted body's index."""
        i = self.joint_name.index(joint_name)
        name = self.body_name[i] + "_backlash"

        def bump(idx: int) -> int:
            return idx + 1 if idx >= i else idx

        self.parent = [bump(p) for p in self.parent]
        self.frame_body = [bump(b) for b in self.frame_body]
        self.contact_body = [bump(b) for b in self.contact_body]

        half = float(play) / 2.0
        self.parent.insert(i, self.parent[i])
        self.joint_type.insert(i, JointType.REVOLUTE)
        self.jp.insert(i, self.jp[i])
        self.axis.insert(i, self.axis[i].copy())
        self.mass.insert(i, 0.0)
        self.com.insert(i, np.zeros(3, np.float32))
        self.inertia_com.insert(i, np.zeros((3, 3), np.float32))
        self.body_name.insert(i, name)
        self.joint_name.insert(i, name + "_joint")
        self.armature.insert(i, np.full(1, armature, np.float32))
        self.damping.insert(i, np.full(1, damping, np.float32))
        self.stiffness.insert(i, np.zeros(1, np.float32))
        self.q_min.insert(i, np.full(1, -half, np.float32))
        self.q_max.insert(i, np.full(1, half, np.float32))
        self.v_max.insert(i, np.full(1, 1e6, np.float32))
        self.u_max.insert(i, np.full(1, 1e6, np.float32))
        self.parent[i + 1] = i
        self.jp[i + 1] = np.eye(4, dtype=np.float32)
        return i

    def fuse_fixed_body(
        self,
        name: str,
        parent: int,
        placement: np.ndarray,
        mass: float = 0.0,
        com=(0.0, 0.0, 0.0),
        inertia=None,
    ) -> int:
        """Fuse a fixed (0-DoF) body into ``parent``: composite the inertia
        and keep the body's frame as an operational frame (the reference's
        Model reduces fixed pinocchio joints the same way — SURVEY.md §2.1
        "Model"). Returns the new frame index. ``parent`` may be -1 only for
        massless world attachments (then nothing is fused)."""
        R = placement[:3, :3].astype(np.float32)
        p = placement[:3, 3].astype(np.float32)
        frame = self.add_frame(name, parent, placement)
        if parent < 0 or mass <= 0.0:
            return frame
        if inertia is None:
            inertia = np.zeros((3, 3), dtype=np.float32)
        inertia = np.asarray(inertia, dtype=np.float32)
        if inertia.shape == (3,):
            inertia = np.diag(inertia)
        # child's com and com-inertia expressed in the parent body frame
        c2 = R @ np.asarray(com, np.float32) + p
        i2 = R @ inertia @ R.T
        m1 = self.mass[parent]
        c1 = self.com[parent]
        i1 = self.inertia_com[parent]
        m = m1 + float(mass)
        c = (m1 * c1 + mass * c2) / m

        def shift(I, mi, ci):
            d = ci - c
            return I + mi * (np.dot(d, d) * np.eye(3, dtype=np.float32)
                             - np.outer(d, d))

        self.mass[parent] = m
        self.com[parent] = c.astype(np.float32)
        self.inertia_com[parent] = (
            shift(i1, m1, c1) + shift(i2, float(mass), c2)
        ).astype(np.float32)
        return frame

    def add_frame(self, name: str, body: int, placement: np.ndarray | None = None) -> int:
        self.frame_body.append(body)
        self.frame_name.append(name)
        self.fp.append(np.eye(4, dtype=np.float32) if placement is None else placement)
        return len(self.frame_body) - 1

    def add_contact_point(
        self, name: str, body: int, pos=(0.0, 0.0, 0.0), radius: float = 0.0
    ) -> int:
        self.contact_body.append(body)
        self.contact_pos.append(np.asarray(pos, np.float32))
        self.contact_radius.append(float(radius))
        self.contact_frame_name.append(name)
        return len(self.contact_body) - 1

    def add_contact_sphere(
        self, name: str, body: int, center=(0.0, 0.0, 0.0), radius: float = 0.0
    ) -> int:
        """Collision sphere vs ground: contacts at center − r·n."""
        return self.add_contact_point(name, body, center, radius=radius)

    def add_contact_capsule(
        self, name: str, body: int, p0, p1, radius: float
    ) -> tuple[int, int]:
        """Capsule vs ground as its two end spheres (the standard
        primitive decomposition for ground contact: the cylindrical side
        only touches flat ground when both ends do)."""
        return (
            self.add_contact_sphere(f"{name}_a", body, p0, radius=radius),
            self.add_contact_sphere(f"{name}_b", body, p1, radius=radius),
        )

    def build(self, dtype=jnp.float32) -> KinematicTree:
        nb = len(self.parent)
        q_off, v_off = [], []
        nq = nv = 0
        for t in self.joint_type:
            q_off.append(nq)
            v_off.append(nv)
            nq += JOINT_NQ[t]
            nv += JOINT_NV[t]

        jp = np.stack(self.jp) if nb else np.zeros((0, 4, 4), np.float32)
        # inertia about body origin via parallel axis
        masses, hs, mats = [], [], []
        for m, c, ic in zip(self.mass, self.com, self.inertia_com):
            ch = np.array(
                [[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0]], np.float32
            )
            mats.append(ic + m * (ch @ ch.T))
            hs.append(m * c)
            masses.append(m)

        fp = np.stack(self.fp) if self.fp else np.zeros((0, 4, 4), np.float32)
        cp = (
            np.stack(self.contact_pos)
            if self.contact_pos
            else np.zeros((0, 3), np.float32)
        )

        def arr(x, shape=None):
            a = np.asarray(x, np.float32)
            if shape is not None and a.size == 0:
                a = a.reshape(shape)
            return jnp.asarray(a, dtype=dtype)

        return KinematicTree(
            nb=nb,
            nq=nq,
            nv=nv,
            parent=tuple(self.parent),
            joint_type=tuple(JointType(t) for t in self.joint_type),
            q_off=tuple(q_off),
            v_off=tuple(v_off),
            body_name=tuple(self.body_name),
            joint_name=tuple(self.joint_name),
            frame_body=tuple(self.frame_body),
            frame_name=tuple(self.frame_name),
            contact_body=tuple(self.contact_body),
            contact_frame_name=tuple(self.contact_frame_name),
            jp_rot=arr(jp[:, :3, :3], (0, 3, 3)),
            jp_pos=arr(jp[:, :3, 3], (0, 3)),
            axis=arr(np.stack(self.axis) if nb else np.zeros((0, 3)), (0, 3)),
            inertia_mass=arr(masses, (0,)),
            inertia_h=arr(np.stack(hs) if nb else np.zeros((0, 3)), (0, 3)),
            inertia_mat=arr(np.stack(mats) if nb else np.zeros((0, 3, 3)), (0, 3, 3)),
            armature=arr(np.concatenate(self.armature) if nb else np.zeros(0), (0,)),
            damping=arr(np.concatenate(self.damping) if nb else np.zeros(0), (0,)),
            stiffness=arr(np.concatenate(self.stiffness) if nb else np.zeros(0), (0,)),
            q_min=arr(np.concatenate(self.q_min) if nb else np.zeros(0), (0,)),
            q_max=arr(np.concatenate(self.q_max) if nb else np.zeros(0), (0,)),
            v_max=arr(np.concatenate(self.v_max) if nb else np.zeros(0), (0,)),
            u_max=arr(np.concatenate(self.u_max) if nb else np.zeros(0), (0,)),
            gravity=arr(self._gravity),
            fp_rot=arr(fp[:, :3, :3], (0, 3, 3)),
            fp_pos=arr(fp[:, :3, 3], (0, 3)),
            contact_pos=arr(cp, (0, 3)),
            contact_radius=arr(self.contact_radius, (0,)),
        )
