"""Featherstone rigid-body algorithms over a KinematicTree, in pure JAX.

Replaces the reference's Pinocchio dependency and jiminy's
``pinocchio_overload::{aba,rnea,crba}`` with-armature variants
(SURVEY.md §2.1 "Pinocchio overloads", §2.7 item 1).

Conventions:
- Spatial vectors are (angular, linear), expressed in the local body frame
  at the body-frame origin.
- Configuration/velocity layouts follow Pinocchio (which the reference
  exposes to users): FREE q=[pos, quat xyzw], v=[v_lin local, ω local];
  SPHERICAL q=[quat xyzw], v=[ω local]; REVOLUTE/PRISMATIC scalars.
- Loops over bodies are unrolled at trace time (topology is static);
  the environment batch axis is added by ``jax.vmap`` outside, making every
  op a wide vector op on the TPU VPU (SURVEY.md §7 step 2).

All functions take a single-robot (unbatched) ``q``/``v``; callers vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jiminy_tpu.core.tree import JOINT_NQ, JOINT_NV, JointType, KinematicTree
from jiminy_tpu.math import so3
from jiminy_tpu.math.spatial import (
    SpatialInertia,
    Transform,
    mm_at_b,
    motion_cross,
    motion_cross_force,
)


def f32_matmul(fn):
    """Force TRUE-f32 matmul precision while tracing ``fn`` (TPU fix).

    The TPU backend lowers f32 matmuls to bf16 MXU passes by default;
    under ``vmap`` the per-body 3×3 matvecs become batched matmuls and
    vmapped FK on a real chip drifts ~1e-3 m from the CPU/f64 truth —
    enough to flip contact activation and inject phantom O(100 N)
    impulses (round-3 diagnosis: the vmapped XLA impulse path on TPU
    produced a 400 N contact on a foot 0.2 mm ABOVE the ground while
    the all-Pallas substep kernel, which does explicit f32 FMAs, was
    exact; `jax.default_matmul_precision("highest")` restores 1e-7
    agreement). Robot-scale matmuls are a negligible FLOP fraction, so
    full precision costs nothing here; the RL learner's MLPs live
    outside the engine and keep the fast bf16 default."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _axis_angle_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation about a (constant unit) axis."""
    from jiminy_tpu.math.spatial import mm3

    c, s = jnp.cos(angle), jnp.sin(angle)
    K = so3.hat(axis)
    return jnp.eye(3, dtype=axis.dtype) + s * K + (1.0 - c) * mm3(K, K)


def joint_transform(tree: KinematicTree, i: int, q: jax.Array) -> Transform:
    """Pose of body i's frame in its joint reference frame, X_J(q_i)."""
    t = tree.joint_type[i]
    off = tree.q_off[i]
    if t == JointType.FREE:
        return Transform(
            rot=so3.quat_to_matrix(q[off + 3 : off + 7]), pos=q[off : off + 3]
        )
    if t == JointType.REVOLUTE:
        return Transform(
            rot=_axis_angle_matrix(tree.axis[i], q[off]),
            pos=jnp.zeros(3, dtype=q.dtype),
        )
    if t == JointType.PRISMATIC:
        return Transform(
            rot=jnp.eye(3, dtype=q.dtype), pos=tree.axis[i] * q[off]
        )
    if t == JointType.SPHERICAL:
        return Transform(
            rot=so3.quat_to_matrix(q[off : off + 4]), pos=jnp.zeros(3, dtype=q.dtype)
        )
    raise ValueError(f"unsupported joint type {t}")


def motion_subspace(tree: KinematicTree, i: int, dtype) -> jax.Array:
    """S_i: (6, nv_i) mapping joint velocity to local spatial velocity."""
    t = tree.joint_type[i]
    if t == JointType.FREE:
        # v layout [v_lin, ω] → spatial (ω, v_lin)
        S = jnp.zeros((6, 6), dtype=dtype)
        S = S.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))
        S = S.at[3:6, 0:3].set(jnp.eye(3, dtype=dtype))
        return S
    if t == JointType.REVOLUTE:
        return jnp.concatenate([tree.axis[i], jnp.zeros(3, dtype=dtype)])[:, None]
    if t == JointType.PRISMATIC:
        return jnp.concatenate([jnp.zeros(3, dtype=dtype), tree.axis[i]])[:, None]
    if t == JointType.SPHERICAL:
        S = jnp.zeros((6, 3), dtype=dtype)
        return S.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    raise ValueError(f"unsupported joint type {t}")


@f32_matmul
def _local_transforms(tree: KinematicTree, q: jax.Array) -> list[Transform]:
    """X_λi: pose of body i in its parent's frame, for every body."""
    return [
        tree.joint_placement(i).compose(joint_transform(tree, i, q))
        for i in range(tree.nb)
    ]


@f32_matmul
def forward_kinematics(tree: KinematicTree, q: jax.Array) -> list[Transform]:
    """World pose of every body frame."""
    xl = _local_transforms(tree, q)
    xw: list[Transform] = []
    for i in range(tree.nb):
        p = tree.parent[i]
        xw.append(xl[i] if p < 0 else xw[p].compose(xl[i]))
    return xw


@f32_matmul
def kinematics(
    tree: KinematicTree, q: jax.Array, v: jax.Array, xl=None
) -> tuple[list[Transform], list[jax.Array]]:
    """World poses and local-frame spatial velocities of every body.
    ``xl``: optionally reuse precomputed local transforms."""
    xl = _local_transforms(tree, q) if xl is None else xl
    xw: list[Transform] = []
    vel: list[jax.Array] = []
    for i in range(tree.nb):
        p = tree.parent[i]
        S = motion_subspace(tree, i, q.dtype)
        vj = S @ v[tree.v_slice(i)]
        if p < 0:
            xw.append(xl[i])
            vel.append(vj)
        else:
            xw.append(xw[p].compose(xl[i]))
            vel.append(xl[i].motion_parent_to_child(vel[p]) + vj)
    return xw, vel


@f32_matmul
def frame_kinematics(
    tree: KinematicTree,
    xw: list[Transform],
    vel: list[jax.Array] | None = None,
):
    """World poses (and optionally world-frame linear velocities) of all
    operational frames. Returns (poses, lin_vels or None)."""
    poses, lvs = [], []
    for k in range(tree.nf):
        b = tree.frame_body[k]
        pose = xw[b].compose(tree.frame_placement(k))
        poses.append(pose)
        if vel is not None:
            w_l, v_l = vel[b][:3], vel[b][3:]
            p_local = tree.fp_pos[k]
            v_frame_local = v_l + jnp.cross(w_l, p_local)
            lvs.append(xw[b].rot @ v_frame_local)
    return poses, (lvs if vel is not None else None)


@f32_matmul
def body_accelerations(
    tree: KinematicTree,
    q: jax.Array,
    v: jax.Array,
    a: jax.Array,
    gravity_offset: bool = True,
) -> tuple[list[Transform], list[jax.Array], list[jax.Array]]:
    """World poses, local spatial velocities AND local spatial accelerations
    of every body given joint accelerations ``a``.

    With ``gravity_offset`` the returned accelerations include −g (i.e. they
    are *proper* accelerations, what an accelerometer measures — reference:
    jiminy's ImuSensor accel output, SURVEY.md §2.1 "Sensors")."""
    dtype = q.dtype
    xl = _local_transforms(tree, q)
    a0 = (
        jnp.concatenate([jnp.zeros(3, dtype=dtype), -tree.gravity.astype(dtype)])
        if gravity_offset
        else jnp.zeros(6, dtype=dtype)
    )
    xw: list[Transform] = []
    vel: list[jax.Array] = []
    acc: list[jax.Array] = []
    for i in range(tree.nb):
        p = tree.parent[i]
        S = motion_subspace(tree, i, dtype)
        vj = S @ v[tree.v_slice(i)]
        aj = S @ a[tree.v_slice(i)]
        if p < 0:
            xw.append(xl[i])
            vel.append(vj)
            acc.append(xl[i].motion_parent_to_child(a0) + aj)
        else:
            xw.append(xw[p].compose(xl[i]))
            vel.append(xl[i].motion_parent_to_child(vel[p]) + vj)
            acc.append(
                xl[i].motion_parent_to_child(acc[p])
                + aj
                + motion_cross(vel[i], vj)
            )
    return xw, vel, acc


@f32_matmul
def rnea(
    tree: KinematicTree,
    q: jax.Array,
    v: jax.Array,
    a: jax.Array,
    fext: jax.Array | None = None,
    xl=None,
) -> jax.Array:
    """Inverse dynamics with armature: tau = ID(q, v, a) - Jᵀ f_ext.

    ``fext``: optional (nb, 6) spatial forces applied to each body,
    expressed in the local body frame at the body origin.
    Reference: jiminy's rnea overload adds motor armature
    (SURVEY.md §2.1 "Pinocchio overloads")."""
    dtype = q.dtype
    xl = _local_transforms(tree, q) if xl is None else xl
    a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -tree.gravity.astype(dtype)])

    vel: list[jax.Array] = [None] * tree.nb
    acc: list[jax.Array] = [None] * tree.nb
    f: list[jax.Array] = [None] * tree.nb
    S_all: list[jax.Array] = [None] * tree.nb

    for i in range(tree.nb):
        p = tree.parent[i]
        S = motion_subspace(tree, i, dtype)
        S_all[i] = S
        vj = S @ v[tree.v_slice(i)]
        aj = S @ a[tree.v_slice(i)]
        if p < 0:
            vel[i] = vj
            acc[i] = xl[i].motion_parent_to_child(a0) + aj
        else:
            vel[i] = xl[i].motion_parent_to_child(vel[p]) + vj
            acc[i] = (
                xl[i].motion_parent_to_child(acc[p])
                + aj
                + motion_cross(vel[i], vj)
            )
        Ii = tree.body_inertia(i)
        f[i] = Ii.mul_motion(acc[i]) + motion_cross_force(vel[i], Ii.mul_motion(vel[i]))
        if fext is not None:
            f[i] = f[i] - fext[i]

    tau = jnp.zeros(tree.nv, dtype=dtype)
    for i in range(tree.nb - 1, -1, -1):
        sl = tree.v_slice(i)
        tau = tau.at[sl].set(S_all[i].T @ f[i])
        p = tree.parent[i]
        if p >= 0:
            f[p] = f[p] + xl[i].force_child_to_parent(f[i])
    return tau + tree.armature * a


@f32_matmul
def crba(tree: KinematicTree, q: jax.Array, xl=None) -> jax.Array:
    """Composite-rigid-body mass matrix with armature on the diagonal."""
    dtype = q.dtype
    xl = _local_transforms(tree, q) if xl is None else xl
    Ic: list[SpatialInertia] = [tree.body_inertia(i) for i in range(tree.nb)]
    M = jnp.zeros((tree.nv, tree.nv), dtype=dtype)

    for i in range(tree.nb - 1, -1, -1):
        p = tree.parent[i]
        if p >= 0:
            Ic[p] = Ic[p].add(Ic[i].transform_by(xl[i]))
        S = motion_subspace(tree, i, dtype)
        F = jnp.stack([Ic[i].mul_motion(S[:, k]) for k in range(S.shape[1])], axis=1)
        sl_i = tree.v_slice(i)
        M = M.at[sl_i, sl_i].set(S.T @ F)
        j = i
        while tree.parent[j] >= 0:
            # propagate F into the parent's frame, fill off-diagonal blocks
            F = jnp.stack(
                [xl[j].force_child_to_parent(F[:, k]) for k in range(F.shape[1])],
                axis=1,
            )
            j = tree.parent[j]
            Sj = motion_subspace(tree, j, dtype)
            blk = F.T @ Sj
            sl_j = tree.v_slice(j)
            M = M.at[sl_i, sl_j].set(blk)
            M = M.at[sl_j, sl_i].set(blk.T)
    return M + jnp.diag(tree.armature.astype(dtype))


def _force_mat(x: Transform) -> jax.Array:
    """Dense 6×6 force transform child→parent: [[R, p̂R], [0, R]]."""
    R = x.rot
    pR = so3.hat(x.pos) @ R
    z = jnp.zeros_like(R)
    return jnp.block([[R, pR], [z, R]])


@f32_matmul
def aba(
    tree: KinematicTree,
    q: jax.Array,
    v: jax.Array,
    tau: jax.Array,
    fext: jax.Array | None = None,
) -> jax.Array:
    """Articulated-body forward dynamics with armature: a = FD(q, v, tau).

    This is THE hot call of the engine step (reference call stack
    SURVEY.md §3.1: ``pinocchio_overload::aba``). ``fext`` as in rnea."""
    dtype = q.dtype
    xl = _local_transforms(tree, q)
    a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -tree.gravity.astype(dtype)])

    vel: list[jax.Array] = [None] * tree.nb
    c: list[jax.Array] = [None] * tree.nb
    IA: list[jax.Array] = [None] * tree.nb
    pA: list[jax.Array] = [None] * tree.nb
    S_all: list[jax.Array] = [None] * tree.nb
    U_all: list[jax.Array] = [None] * tree.nb
    Dinv_all: list[jax.Array] = [None] * tree.nb
    u_all: list[jax.Array] = [None] * tree.nb

    # pass 1: velocities, bias terms
    for i in range(tree.nb):
        p = tree.parent[i]
        S = motion_subspace(tree, i, dtype)
        S_all[i] = S
        vj = S @ v[tree.v_slice(i)]
        if p < 0:
            vel[i] = vj
            c[i] = jnp.zeros(6, dtype=dtype)
        else:
            vel[i] = xl[i].motion_parent_to_child(vel[p]) + vj
            c[i] = motion_cross(vel[i], vj)
        Ii = tree.body_inertia(i)
        IA[i] = Ii.to_matrix()
        pA[i] = motion_cross_force(vel[i], Ii.mul_motion(vel[i]))
        if fext is not None:
            pA[i] = pA[i] - fext[i]

    # pass 2: articulated inertias (backward)
    for i in range(tree.nb - 1, -1, -1):
        S = S_all[i]
        sl = tree.v_slice(i)
        U = IA[i] @ S  # (6, nvj)
        D = S.T @ U + jnp.diag(tree.armature[sl].astype(dtype))
        if S.shape[1] == 1:
            Dinv = 1.0 / D
        else:
            Dinv = jnp.linalg.inv(D)
        u = tau[sl] - S.T @ pA[i]
        U_all[i], Dinv_all[i], u_all[i] = U, Dinv, u
        p = tree.parent[i]
        if p >= 0:
            Ia = IA[i] - U @ Dinv @ U.T
            pa = pA[i] + Ia @ c[i] + U @ (Dinv @ u)
            W = _force_mat(xl[i])
            IA[p] = IA[p] + W @ Ia @ W.T
            pA[p] = pA[p] + W @ pa

    # pass 3: accelerations (forward)
    acc: list[jax.Array] = [None] * tree.nb
    qdd = jnp.zeros(tree.nv, dtype=dtype)
    for i in range(tree.nb):
        p = tree.parent[i]
        a_up = a0 if p < 0 else acc[p]
        a_prime = xl[i].motion_parent_to_child(a_up) + c[i]
        qdd_i = Dinv_all[i] @ (u_all[i] - U_all[i].T @ a_prime)
        qdd = qdd.at[tree.v_slice(i)].set(qdd_i)
        acc[i] = a_prime + S_all[i] @ qdd_i
    return qdd


@f32_matmul
def integrate(tree: KinematicTree, q: jax.Array, v: jax.Array, dt) -> jax.Array:
    """Lie-group configuration integration q ⊕ v·dt (Pinocchio semantics:
    quaternion joints use the exponential map with local-frame tangents;
    SURVEY.md §2.1 "Steppers"). All 1-DoF joints integrate in one
    gather/scatter; quaternion joints unroll."""
    out = q
    one_q = [
        tree.q_off[i]
        for i in range(tree.nb)
        if tree.joint_type[i] in (JointType.REVOLUTE, JointType.PRISMATIC)
    ]
    one_v = [
        tree.v_off[i]
        for i in range(tree.nb)
        if tree.joint_type[i] in (JointType.REVOLUTE, JointType.PRISMATIC)
    ]

    def contig(idx):
        return idx and idx == list(range(idx[0], idx[0] + len(idx)))

    if one_q:
        # STATIC indexing only: index-array gathers are miscompiled by the
        # current TPU backend (see engine/solver.py); contiguous slices
        # cover the common case, per-joint static scatter otherwise
        if contig(one_q) and contig(one_v):
            a, b_ = one_q[0], one_q[0] + len(one_q)
            c, d = one_v[0], one_v[0] + len(one_v)
            out = out.at[a:b_].add(v[c:d] * dt)
        else:
            for qo, vo in zip(one_q, one_v):
                out = out.at[qo].add(v[vo] * dt)
    for i in range(tree.nb):
        t = tree.joint_type[i]
        qo, vo = tree.q_off[i], tree.v_off[i]
        if t == JointType.FREE:
            quat = q[qo + 3 : qo + 7]
            R = so3.quat_to_matrix(quat)
            dp = R @ (v[vo : vo + 3] * dt)
            nq_ = so3.quat_integrate(quat, v[vo + 3 : vo + 6], dt)
            out = out.at[qo : qo + 3].add(dp)
            out = out.at[qo + 3 : qo + 7].set(nq_)
        elif t == JointType.SPHERICAL:
            quat = q[qo : qo + 4]
            out = out.at[qo : qo + 4].set(
                so3.quat_integrate(quat, v[vo : vo + 3], dt)
            )
    return out


@f32_matmul
def difference(tree: KinematicTree, q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Tangent-space difference q2 ⊖ q1 (shape (nv,)); inverse of
    ``integrate`` on the manifold."""
    dv = jnp.zeros(tree.nv, dtype=q1.dtype)
    for i in range(tree.nb):
        t = tree.joint_type[i]
        qo, vo = tree.q_off[i], tree.v_off[i]
        if t == JointType.FREE:
            quat1 = q1[qo + 3 : qo + 7]
            quat2 = q2[qo + 3 : qo + 7]
            R1t = so3.quat_to_matrix(quat1).T
            dp = R1t @ (q2[qo : qo + 3] - q1[qo : qo + 3])
            dw = so3.quat_log(so3.quat_mul(so3.quat_conj(quat1), quat2))
            dv = dv.at[vo : vo + 3].set(dp)
            dv = dv.at[vo + 3 : vo + 6].set(dw)
        elif t == JointType.SPHERICAL:
            quat1 = q1[qo : qo + 4]
            quat2 = q2[qo : qo + 4]
            dv = dv.at[vo : vo + 3].set(
                so3.quat_log(so3.quat_mul(so3.quat_conj(quat1), quat2))
            )
        else:
            dv = dv.at[vo].set(q2[qo] - q1[qo])
    return dv


@f32_matmul
def point_jacobian(
    tree: KinematicTree,
    xw: list[Transform],
    body: int,
    point_world: jax.Array,
) -> jax.Array:
    """World-frame linear-velocity Jacobian (3, nv) of a point attached to
    ``body``. Built by walking the ancestor chain (static topology), used to
    assemble contact/constraint Jacobians for the PGS solver
    (SURVEY.md §2.1 "Constraint solver")."""
    J = jnp.zeros((3, tree.nv), dtype=point_world.dtype)
    j = body
    while j >= 0:
        S = motion_subspace(tree, j, point_world.dtype)
        R, o = xw[j].rot, xw[j].pos
        w_cols = R @ S[:3, :]  # world angular (3, nvj)
        v_cols = R @ S[3:, :]  # world linear at joint origin
        r = point_world - o
        lin = v_cols + jnp.cross(w_cols, r[:, None], axis=0)
        J = J.at[:, tree.v_slice(j)].set(lin)
        j = tree.parent[j]
    return J


@f32_matmul
def frame_jacobian6(
    tree: KinematicTree,
    xw: list[Transform],
    body: int,
    point_world: jax.Array,
) -> jax.Array:
    """World-frame 6-D Jacobian (6, nv) [angular; linear] of a frame at
    ``point_world`` attached to ``body``."""
    J = jnp.zeros((6, tree.nv), dtype=point_world.dtype)
    j = body
    while j >= 0:
        S = motion_subspace(tree, j, point_world.dtype)
        R, o = xw[j].rot, xw[j].pos
        w_cols = R @ S[:3, :]
        v_cols = R @ S[3:, :]
        r = point_world - o
        lin = v_cols + jnp.cross(w_cols, r[:, None], axis=0)
        J = J.at[:3, tree.v_slice(j)].set(w_cols)
        J = J.at[3:, tree.v_slice(j)].set(lin)
        j = tree.parent[j]
    return J


@f32_matmul
def com_position(tree: KinematicTree, xw: list[Transform]) -> jax.Array:
    """Whole-body center of mass in world frame."""
    total_m = 0.0
    weighted = jnp.zeros(3, dtype=xw[0].pos.dtype)
    for i in range(tree.nb):
        m = tree.inertia_mass[i]
        com_local = jnp.where(
            tree.inertia_mass[i] > 0, tree.inertia_h[i] / tree.inertia_mass[i], 0.0
        )
        weighted = weighted + m * xw[i].apply(com_local)
        total_m = total_m + m
    return weighted / total_m


@f32_matmul
def energy(tree: KinematicTree, q: jax.Array, v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(kinetic, potential) energy — the reference engine telemeters both
    (SURVEY.md §2.1 "Engine": energy monitoring)."""
    xw, vel = kinematics(tree, q, v)
    ke = 0.0
    pe = 0.0
    for i in range(tree.nb):
        Ii = tree.body_inertia(i)
        ke = ke + 0.5 * jnp.dot(vel[i], Ii.mul_motion(vel[i]))
        com_w = xw[i].rot @ tree.inertia_h[i] + tree.inertia_mass[i] * xw[i].pos
        pe = pe - jnp.dot(tree.gravity.astype(q.dtype), com_w)
    ke = ke + 0.5 * jnp.sum(tree.armature * v * v)
    return ke, pe
