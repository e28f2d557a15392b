"""Whole-substep Pallas kernel: one launch per physics substep.

Extends ops/constraint_solve.py's lane-major design (batch on the lane
dimension, every per-robot scalar a (S,128) vector of envs) backward
through the ENTIRE impulse substep of engine/engine.py:

    kinematics → CRBA(+armature+implicit diag) → RNEA bias
    → contact/bound row assembly (flat ground) → [shared solve chain:
    chol → M⁻¹[p|Jᵀ] → Delassus → grouped PGS] → integrate

The constraint-solve kernel alone took the ANYmal bench 1.04M→1.49M
env-steps/s by collapsing the chain's dozens of XLA kernel launches into
one; this kernel removes the remaining per-substep launch cloud
(kinematics/CRBA/RNEA are ~60 more small XLA ops each).

Scope (gated in the engine; anything else falls back to the per-op
paths): euler_symplectic stepper, constraint contact model, flat /
Fourier / analytic-stairs ground (per-env coefficients as a traced
input), FREE/REVOLUTE/PRISMATIC/SPHERICAL joints (spherical = the
quaternion flexibility joints, with the −k·log(quat) restoring torque
in-kernel), DistanceConstraint closed loops, declared collision pairs
(in-kernel narrow phases incl. box SDF), per-env model randomization
(inertial/motor lanes as a traced input — see SubstepSpec.randomized),
the in-kernel sensor stage, no external forces. Joint torque
(controller + motor model +
springs) is computed outside for the single-substep kernel; the
multi-substep kernel (substep_batched_pallas_multi) recomputes it
IN-KERNEL from a declarative TorqueSpec and runs all n_substeps of an
env step in one launch (engine gate: EngineOptions.substep_fusion).

Math is mirrored 1:1 from core/algos.py (kinematics/crba/rnea/
point_jacobian/integrate) and engine/engine.py's row assembly; validated
against them in tests/test_substep_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core.tree import JointType, KinematicTree
from jiminy_tpu.ops.constraint_solve import (
    LANES,
    SolveConfig,
    _pick_sublanes,
    _solve_chain,
    _to_lane_major,
)

# ---------------------------------------------------------------------------
# Lane-major mini spatial library: vec3 = [x,y,z], mat3 = 3×3 nested lists.
# Elements are (S,128) jnp values or python floats (constants broadcast).
# ---------------------------------------------------------------------------


def v3(x=0.0, y=0.0, z=0.0):
    return [x, y, z]


def v_add(a, b):
    return [a[i] + b[i] for i in range(3)]


def v_sub(a, b):
    return [a[i] - b[i] for i in range(3)]


def v_scale(a, s):
    return [a[i] * s for i in range(3)]


def v_cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def m_id():
    return [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def m_mul(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def m_vec(A, x):
    return [sum(A[i][k] * x[k] for k in range(3)) for i in range(3)]


def m_t(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def m_tvec(A, x):  # Aᵀ x
    return [sum(A[k][i] * x[k] for k in range(3)) for i in range(3)]


def m_add(A, B):
    return [[A[i][j] + B[i][j] for j in range(3)] for i in range(3)]


def m_hat(p):  # skew(p)
    return [
        [0.0, -p[2], p[1]],
        [p[2], 0.0, -p[0]],
        [-p[1], p[0], 0.0],
    ]


def quat_to_m(q):  # q = [x,y,z,w] of lane scalars
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [
        [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
        [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
        [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)],
    ]


# Transforms as (R: mat3, p: vec3); spatial vectors as (w: vec3, v: vec3);
# spatial inertias as (m, h: vec3, I: mat3) mirroring math/spatial.py.


def x_compose(Ra, pa, Rb, pb):
    return m_mul(Ra, Rb), v_add(m_vec(Ra, pb), pa)


def motion_p2c(R, p, w, v):
    """Transform.motion_parent_to_child on (w, v)."""
    wc = m_tvec(R, w)
    vc = m_tvec(R, v_sub(v, v_cross(p, w)))
    return wc, vc


def force_c2p(R, p, ang, lin):
    """Transform.force_child_to_parent on (ang, lin)."""
    lp = m_vec(R, lin)
    ap = v_add(m_vec(R, ang), v_cross(p, lp))
    return ap, lp


def inertia_mul_motion(m, h, I, w, v):
    """SpatialInertia.mul_motion: (ang, lin)."""
    ang = v_add(m_vec(I, w), v_cross(h, v))
    lin = v_sub(v_scale(v, m), v_cross(h, w))
    return ang, lin


def inertia_transform(m, h, I, R, p):
    """SpatialInertia.transform_by(Transform(R, p)) — child C → parent A."""
    rh = m_vec(R, h)
    h_a = v_add(rh, v_scale(p, m))
    ph = m_hat(p)
    rot = m_mul(m_mul(R, I), m_t(R))  # mm3_bt(mm3(R, I), R)
    t2 = m_mul(ph, m_t(m_hat(rh)))
    t3 = m_mul(m_hat(h_a), m_t(ph))
    return m, h_a, m_add(m_add(rot, t2), t3)


def motion_cross6(w1, v1, w2, v2):
    """motion_cross((w1,v1), (w2,v2))."""
    return v_cross(w1, w2), v_add(v_cross(v1, w2), v_cross(w1, v2))


def force_cross6(w, v, ang, lin):
    """motion_cross_force((w,v), (ang,lin))."""
    return (
        v_add(v_cross(w, ang), v_cross(v, lin)),
        v_cross(w, lin),
    )


# ---------------------------------------------------------------------------
# Static description of the substep problem
# ---------------------------------------------------------------------------


class SubstepSpec:
    """Numpy-side constants extracted once from a KinematicTree + engine
    options. Hash/eq by identity (one per engine instance)."""

    def __init__(self, tree: KinematicTree, opts, solve_cfg: SolveConfig,
                 bounded_joints, color_order, ground_height: float,
                 friction: float, dist_constraints=(),
                 ground_mode: str = "flat", n_fourier: int = 0,
                 torque: "TorqueSpec | None" = None,
                 base_wrench: bool = False, pairs=None,
                 randomized: bool = False):
        f = lambda a: np.asarray(a, np.float64)
        self.nb = tree.nb
        self.nq, self.nv = tree.nq, tree.nv
        self.ncp = tree.ncp
        self.parent = [int(p) for p in tree.parent]
        self.joint_type = [int(t) for t in tree.joint_type]
        self.q_off = [int(o) for o in tree.q_off]
        self.v_off = [int(o) for o in tree.v_off]
        self.axis = f(tree.axis)
        self.jp_rot = f(tree.jp_rot)  # (nb, 3, 3) joint placements
        self.jp_pos = f(tree.jp_pos)
        self.mass = f(tree.inertia_mass)
        self.h = f(tree.inertia_h)
        self.inertia = f(tree.inertia_mat)
        self.armature = f(tree.armature)
        self.damping = f(tree.damping)
        self.stiffness = f(tree.stiffness)
        self.gravity = f(tree.gravity)
        self.q_min = f(tree.q_min)
        self.q_max = f(tree.q_max)
        self.contact_body = [int(b) for b in tree.contact_body]
        self.contact_pos = f(tree.contact_pos)
        # collision-sphere radii (0 = bare point); static per site, so
        # the surface-point offset unrolls with no dynamic control flow
        self.contact_radius = [
            float(x) for x in np.asarray(tree.contact_radius)
        ]
        self.opts = opts
        self.cfg = solve_cfg
        self.bounded_joints = list(bounded_joints)
        self.color_order = list(color_order)
        self.ground_height = float(ground_height)
        self.friction = float(friction)
        # "flat": analytic plane z = ground_height (fixed tangent basis).
        # "fourier": FourierGround — height/normal evaluated IN-KERNEL as
        # K sin/cos terms from a per-env coefficient vector input (pure
        # vector math; grid heightmaps would need dynamic gathers, which
        # Mosaic lowers poorly).
        # "stairs": StairsGround — analytic staircase from a 5-float
        # per-env parameter vector (floor/clip lane math, no gather).
        # "perlin": PerlinGround — analytic fractal gradient noise from a
        # 3-float per-env parameter vector [seed, freq, amp] (int32 hash
        # + selects, no permutation-table gather); octave count is baked
        # via n_fourier (reused as the static term count).
        # Reference: ground profile queried by the contact pipeline
        # (SURVEY.md §2.1 "Contact model" / "Random / terrain").
        if ground_mode not in ("flat", "fourier", "stairs", "perlin"):
            raise ValueError(f"unknown ground_mode {ground_mode!r}")
        self.ground_mode = ground_mode
        self.n_fourier = int(n_fourier)
        # DistanceConstraints (Cassie pushrods): tuples of
        # (body1, p1_local, body2, p2_local, distance, baumgarte_freq)
        # snapshot fp_pos to numpy BEFORE indexing: this spec may be
        # built lazily inside a jit trace (randomized/sensor variants),
        # where indexing a concrete jnp constant lifts it to a tracer
        fp_pos_np = (
            np.asarray(tree.fp_pos) if dist_constraints else None
        )
        self.dist_constraints = [
            (
                int(tree.frame_body[c.frame1]),
                [float(x) for x in fp_pos_np[c.frame1]],
                int(tree.frame_body[c.frame2]),
                [float(x) for x in fp_pos_np[c.frame2]],
                float(c.distance),
                float(c.baumgarte_freq),
            )
            for c in dist_constraints
        ]
        # optional in-kernel actuation-torque path (multi-substep kernel)
        self.torque = torque
        # accept a (6,) [ang; lin] LOCAL spatial wrench on the root body
        # as a traced input (push disturbances — the reference's
        # external-force registry applied to the base; zero-cost when
        # fed zeros, so engines enable it unconditionally)
        self.base_wrench = bool(base_wrench)
        # declared body-body/self-collision pairs (engine/collision.py
        # CollisionPairSet): the pair's CONTACT GENERATORS are baked as
        # static floats and re-run lane-major in-kernel — seg (the
        # branchless segment-segment closest point), ptbox (points vs
        # an exact oriented-box SDF: box-box corner sets, capsule-box
        # axis samples) and ptseg (points vs a capsule SDF). Each pair
        # spans one PGS color of its contact patch, mirroring the XLA
        # path's pair_rows exactly (reference: hpp-fcl pairs resolved
        # inside the engine's hot loop, SURVEY.md §2.1 "Engine")
        self.pair_gens = []
        self.pair_contacts = []
        if pairs is not None:
            ff = lambda x: [float(y) for y in np.asarray(x)]
            for kind, g in pairs.gens:
                if kind == "seg":
                    self.pair_gens.append((
                        "seg",
                        {
                            "ba": int(g["ba"]), "a0": ff(g["a0"]),
                            "a1": ff(g["a1"]), "ra": float(g["ra"]),
                            "bb": int(g["bb"]), "b0": ff(g["b0"]),
                            "b1": ff(g["b1"]), "rb": float(g["rb"]),
                            "mu": float(g["mu"]),
                        },
                    ))
                elif kind == "ptbox":
                    self.pair_gens.append((
                        "ptbox",
                        {
                            "bp": int(g["bp"]),
                            "pts": [ff(p) for p in g["pts"]],
                            "rp": float(g["rp"]), "bf": int(g["bf"]),
                            "c": ff(g["c"]),
                            "R": [ff(r) for r in g["R"]],
                            "h": ff(g["h"]), "mu": float(g["mu"]),
                        },
                    ))
                else:  # ptseg
                    self.pair_gens.append((
                        "ptseg",
                        {
                            "bp": int(g["bp"]),
                            "pts": [ff(p) for p in g["pts"]],
                            "rp": float(g["rp"]), "bf": int(g["bf"]),
                            "p0": ff(g["p0"]), "p1": ff(g["p1"]),
                            "rs": float(g["rs"]), "mu": float(g["mu"]),
                        },
                    ))
            self.pair_contacts = list(pairs.contacts_per_pair)
        # per-env model randomization: when True, the PERTURBED inertial
        # constants (mass, h, origin inertia, armature [+ motor gain /
        # friction scales when torque is baked]) arrive as one packed
        # (n_mp,) traced lane input instead of baked python floats —
        # kills the XLA-fallback tax on domain-randomized training
        # (reference: model randomization hooks, SURVEY.md §2.1 "Model")
        self.randomized = bool(randomized)
        # in-kernel sensor stage (SensorKernelSpec | None): the fused
        # multi-substep kernel measures + corrupts + ring-pushes the
        # sensor delay lines every sensors.k_obs substeps, VMEM-resident
        # — set via Engine on a shallow spec copy, never at build here
        self.sensors = None

    @property
    def n_mp(self) -> int:
        """Width of the per-env model-parameter input (0 = baked).
        Layout: mass (nb) ‖ h (3·nb) ‖ I_sym xx,yy,zz,xy,xz,yz (6·nb) ‖
        armature (nv) [‖ motor gain (nm) ‖ motor friction scale (nm)]."""
        if not self.randomized:
            return 0
        n = 10 * self.nb + self.nv
        if self.torque is not None:
            n += 2 * self.torque.nm
        return n

    @property
    def n_gc(self) -> int:
        """Width of the per-env ground-coefficient input (0 = flat)."""
        if self.ground_mode == "fourier":
            return 4 * self.n_fourier
        if self.ground_mode == "stairs":
            return 5
        if self.ground_mode == "perlin":
            return 3  # [seed, freq, amp]; octaves static in n_fourier
        return 0


class TorqueSpec:
    """Static description of the per-substep actuation-torque path
    (inner-loop PD + motor model + joint damping/springs) so the
    multi-substep kernel can recompute τ(q, v, cmd) IN-KERNEL between
    substeps — engine._joint_torque mirrored lane-major (reference call
    stack SURVEY.md §3.1: controller → motor model → internal dynamics).

    mode "pd":     cmd is the (nm,) PD target;
                   u_m = kp·(cmd − q[q_idx]) − kd·v[v_idx].
    mode "direct": cmd IS the (nm,) motor command (zero-order hold);
                   friction / velocity-derate still re-evaluate per
                   substep at the current joint velocity."""

    def __init__(self, mode, q_idx, v_idx, reduction, effort_limit,
                 velocity_limit, friction_dry, friction_viscous,
                 friction_vel_eps, kp=None, kd=None):
        if mode not in ("pd", "direct"):
            raise ValueError(f"unknown torque mode {mode!r}")
        if mode == "pd" and (kp is None or kd is None):
            raise ValueError("pd mode requires kp and kd")
        ff = lambda a: [float(x) for x in np.asarray(a)]
        self.mode = mode
        self.q_idx = [int(i) for i in q_idx]
        self.v_idx = [int(i) for i in v_idx]
        self.reduction = ff(reduction)
        self.effort_limit = ff(effort_limit)
        self.velocity_limit = ff(velocity_limit)
        self.friction_dry = ff(friction_dry)
        self.friction_viscous = ff(friction_viscous)
        self.friction_vel_eps = ff(friction_vel_eps)
        self.kp = ff(kp) if kp is not None else None
        self.kd = ff(kd) if kd is not None else None

    @property
    def nm(self) -> int:
        return len(self.v_idx)


def _compute_tau(spec: SubstepSpec, q, v, cmd, mscale=None):
    """engine._joint_torque in lane-major form: PD / direct motor command
    → effort clamp → reduction → velocity derate → − friction, then
    joint damping, 1-DoF joint springs and spherical flexibility
    restoring torques −k·log(quat) (hardware/motors.py compute_effort +
    engine._spring_torques). Returns a list of
    nv lane values. ``mscale`` = (gain, fric) per-motor lane scales for
    randomized models (ModelParams.apply_to_motors: gain multiplies the
    reduction, fric multiplies dry + viscous friction)."""
    ts = spec.torque
    gain_s, fric_s = mscale if mscale is not None else (None, None)
    zero = jnp.zeros_like(q[0])
    tau = [zero] * spec.nv
    for m in range(ts.nm):
        vi = ts.v_idx[m]
        v_j = v[vi]
        if ts.mode == "pd":
            u = ts.kp[m] * (cmd[m] - q[ts.q_idx[m]]) - ts.kd[m] * v_j
        else:
            u = cmd[m]
        el = ts.effort_limit[m]
        u = jnp.clip(u, -el, el)
        red = ts.reduction[m]
        if gain_s is not None:
            red = red * gain_s[m]
        tau_m = red * u
        vl = ts.velocity_limit[m]
        over = jnp.clip(
            (jnp.abs(v_j) - vl) / (0.1 * max(vl, 1e-6)), 0.0, 1.0
        )
        same_dir = jnp.sign(tau_m) == jnp.sign(v_j)
        tau_m = jnp.where(same_dir, tau_m * (1.0 - over), tau_m)
        fric = ts.friction_dry[m] * jnp.tanh(
            v_j / ts.friction_vel_eps[m]
        ) + ts.friction_viscous[m] * v_j
        if fric_s is not None:
            fric = fric * fric_s[m]
        tau[vi] = tau[vi] + tau_m - fric
    for r in range(spec.nv):
        d = float(spec.damping[r])
        if d:
            tau[r] = tau[r] - d * v[r]
    for i in range(spec.nb):
        t = spec.joint_type[i]
        if t == int(JointType.FREE):
            continue
        vo, qo = spec.v_off[i], spec.q_off[i]
        if t == int(JointType.SPHERICAL):
            # flexibility restoring torque −k·log(quat)
            # (engine._spring_torques)
            ks = [float(spec.stiffness[vo + r]) for r in range(3)]
            if any(ks):
                rv = _quat_log_lane(
                    [q[qo], q[qo + 1], q[qo + 2], q[qo + 3]]
                )
                for r in range(3):
                    tau[vo + r] = tau[vo + r] - ks[r] * rv[r]
            continue
        k = float(spec.stiffness[vo])
        if k:
            tau[vo] = tau[vo] - k * q[qo]
    return tau


_ATAN_COEF = (  # Abramowitz & Stegun 4.4.49, |err| ≤ 2e-8 on [0, 1]
    0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
    0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580,
)


def _atan2_pos_lane(s, w):
    """atan2(s, w) for s, w ≥ 0 lanes — Mosaic has no atan2 primitive,
    so: octant swap into x ∈ [0, 1] + the A&S polynomial."""
    swap = s > w
    num = jnp.where(swap, w, s)
    den = jnp.where(swap, s, w)
    x = num / jnp.maximum(den, 1e-30)
    x2 = x * x
    p = _ATAN_COEF[-1]
    for c in _ATAN_COEF[-2::-1]:
        p = p * x2 + c
    p = p * x
    return jnp.where(swap, (np.pi / 2.0) - p, p)


def _quat_log_lane(qv):
    """so3.quat_log on [x, y, z, w] lanes → rotation-vector lanes."""
    s2 = qv[0] * qv[0] + qv[1] * qv[1] + qv[2] * qv[2]
    s = jnp.sqrt(s2 + 1e-24)
    w = jnp.abs(qv[3])
    sign = jnp.where(qv[3] < 0.0, -1.0, 1.0)
    angle = 2.0 * _atan2_pos_lane(s, w)
    small = s2 < 1e-14
    scale = jnp.where(
        small, 2.0 / jnp.maximum(w, 1e-12), angle / s
    )
    return [sign * qv[k] * scale for k in range(3)]


def _lane(x, like):
    """Broadcast a python float to the (S,128) lane shape of ``like``."""
    if isinstance(x, (int, float)):
        return jnp.full(like.shape, jnp.float32(x))
    return x


def _unpack_mp(spec: SubstepSpec, mp_ref):
    """Per-env model-parameter block → (inert, arm, gain, fric): inert a
    list of nb (m, h, I) lane tuples, arm a list of nv lane armatures,
    gain/fric per-motor lane scales (None when no torque path). Layout
    mirrors Engine._pack_model_params / SubstepSpec.n_mp."""
    nb, nv = spec.nb, spec.nv
    o = 0
    mass = [mp_ref[o + i, 0] for i in range(nb)]
    o += nb
    h = [[mp_ref[o + 3 * i + k, 0] for k in range(3)] for i in range(nb)]
    o += 3 * nb
    inert = []
    for i in range(nb):
        xx, yy, zz, xy, xz, yz = (
            mp_ref[o + 6 * i + k, 0] for k in range(6)
        )
        inert.append(
            (mass[i], h[i], [[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
        )
    o += 6 * nb
    arm = [mp_ref[o + r, 0] for r in range(nv)]
    o += nv
    gain = fric = None
    if spec.torque is not None:
        nm = spec.torque.nm
        gain = [mp_ref[o + m, 0] for m in range(nm)]
        o += nm
        fric = [mp_ref[o + m, 0] for m in range(nm)]
        o += nm
    return inert, arm, gain, fric


def _seg_seg_lane(p1, q1, p2, q2, eps=1e-9):
    """Closest points between segments [p1,q1], [p2,q2] of lane vec3s —
    engine/collision.closest_segment_segment (Ericson §5.1.9, branchless)
    mirrored element-wise so both backends run the identical narrow
    phase. Returns (ca, cb)."""
    d1 = v_sub(q1, p1)
    d2 = v_sub(q2, p2)
    r = v_sub(p1, p2)
    a = v_dot(d1, d1)
    e = v_dot(d2, d2)
    f = v_dot(d2, r)
    c = v_dot(d1, r)
    b = v_dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(
        denom > eps,
        jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0),
        0.0,
    )
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        t != t_cl,
        jnp.where(
            a > eps,
            jnp.clip((t_cl * b - c) / jnp.maximum(a, eps), 0.0, 1.0),
            0.0,
        ),
        s,
    )
    t = t_cl
    return v_add(p1, v_scale(d1, s)), v_add(p2, v_scale(d2, t))


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _lane_joint_motion(spec: SubstepSpec, i: int, vec, zero):
    """S_i @ vec_slice(i) as (w, v) lane lists (``vec`` a list of nv
    lanes — velocities or accelerations)."""
    JT = JointType
    t = spec.joint_type[i]
    vo = spec.v_off[i]

    def lane(x):
        return _lane(x, zero)

    if t == JT.FREE:
        return (
            [vec[vo + 3], vec[vo + 4], vec[vo + 5]],
            [vec[vo], vec[vo + 1], vec[vo + 2]],
        )
    if t == JT.SPHERICAL:
        return [vec[vo], vec[vo + 1], vec[vo + 2]], [zero] * 3
    ax = [float(a) for a in spec.axis[i]]
    if t == JT.REVOLUTE:
        return [lane(a) * vec[vo] if a else zero for a in ax], [zero] * 3
    return [zero] * 3, [lane(a) * vec[vo] if a else zero for a in ax]


def _lane_fk(spec: SubstepSpec, q, v, zero):
    """Forward kinematics on lane values (mirrors algos.kinematics):
    returns (xl, xw, vel) — local transforms, world poses (R, p) and
    local spatial velocities (w, v) per body. Shared by the substep
    math and the in-kernel sensor stage."""
    JT = JointType
    nb = spec.nb

    def lane(x):
        return _lane(x, zero)

    xl = []  # list of (R, p)
    for i in range(nb):
        t = spec.joint_type[i]
        off = spec.q_off[i]
        if t == JT.FREE:
            Rj = quat_to_m([q[off + 3], q[off + 4], q[off + 5], q[off + 6]])
            pj = [q[off], q[off + 1], q[off + 2]]
        elif t == JT.SPHERICAL:
            # flexibility joints (quaternion-parameterized 3-DoF
            # rotation — reference: flexible joints, SURVEY.md §2.1
            # "Model")
            Rj = quat_to_m([q[off], q[off + 1], q[off + 2], q[off + 3]])
            pj = [zero, zero, zero]
        elif t == JT.REVOLUTE:
            # Rodrigues about constant axis (algos._axis_angle_matrix)
            ax = [float(a) for a in spec.axis[i]]
            c, s = jnp.cos(q[off]), jnp.sin(q[off])
            K = m_hat(ax)
            KK = m_mul(K, K)
            Rj = [
                [
                    (1.0 if r == c2 else 0.0) + s * K[r][c2]
                    + (1.0 - c) * KK[r][c2]
                    for c2 in range(3)
                ]
                for r in range(3)
            ]
            pj = [zero, zero, zero]
        elif t == JT.PRISMATIC:
            ax = [float(a) for a in spec.axis[i]]
            Rj = m_id()
            pj = [lane(a) * q[off] if a else zero for a in ax]
        else:
            raise ValueError("substep kernel: unsupported joint type")
        Rp = [[float(spec.jp_rot[i][r][c2]) for c2 in range(3)]
              for r in range(3)]
        pp = [float(spec.jp_pos[i][k]) for k in range(3)]
        xl.append(x_compose(Rp, pp, Rj, pj))

    xw = []  # world (R, p)
    vel = []  # local spatial (w, v)
    for i in range(nb):
        p = spec.parent[i]
        wj, vj = _lane_joint_motion(spec, i, v, zero)
        if p < 0:
            xw.append(xl[i])
            vel.append((wj, vj))
        else:
            xw.append(x_compose(*xw[p], *xl[i]))
            wp, vp = motion_p2c(*xl[i], *vel[p])
            vel.append((v_add(wp, wj), v_add(vp, vj)))
    return xl, xw, vel


def _substep_math(spec: SubstepSpec, q, v, tau, lam0, gq,
                  T_ref, L_ref, X_ref, A_ref, w0=None, mp=None):
    """One substep on lane-major VALUES: q (nq) / v, tau (nv) lists of
    (S,128) lane vectors, lam0 (nc,S,128), gq = None (flat ground) | a
    ``(px, py) → (h, dz/dx, dz/dy)`` lane closure (Fourier / stairs —
    see _ground_query), w0 = None | 6 lanes of a LOCAL [ang; lin]
    spatial wrench on the root body (push disturbances), mp = None |
    (inert, arm) per-env inertial lanes from _unpack_mp (randomized
    models — replaces the baked constants in RNEA/CRBA/armature only;
    kinematics and Jacobians are geometric and unaffected). The scratch
    refs are destroyed. Returns (q_next list, v_next (nv,S,128),
    λ (nc,S,128), residual (S,128), f_contact (3·ncp,S,128) | None).
    Shared by the single-substep body and the multi-substep fori_loop
    body."""
    use_general = gq is not None
    nb, nv, nq, ncp = spec.nb, spec.nv, spec.nq, spec.ncp
    cfg = spec.cfg
    dt = float(cfg.dt)
    opts = spec.opts
    JT = JointType

    zero = jnp.zeros_like(q[0])
    one = jnp.ones_like(q[0])

    def lane(x):
        return _lane(x, zero)

    # per-body spatial inertias + per-dof armature: baked python floats
    # (nominal model) or traced lanes (per-env randomization)
    if mp is None:
        inert = [
            (
                float(spec.mass[i]),
                [float(x) for x in spec.h[i]],
                [[float(spec.inertia[i][r][c2]) for c2 in range(3)]
                 for r in range(3)],
            )
            for i in range(nb)
        ]
        arm = [float(spec.armature[r]) for r in range(nv)]
    else:
        inert, arm = mp

    # ---- FK: local transforms + world poses + local velocities ----------
    xl, xw, vel = _lane_fk(spec, q, v, zero)

    def joint_motion(i, vec=v):
        return _lane_joint_motion(spec, i, vec, zero)

    # ---- RNEA bias: rnea(q, v, 0) (algos.rnea with a=0, no fext) --------
    g = [float(-x) for x in spec.gravity]  # a0 linear part = −gravity
    acc = []
    fb = []  # body forces (ang, lin)
    for i in range(nb):
        p = spec.parent[i]
        if p < 0:
            aw, av = motion_p2c(*xl[i], [0.0, 0.0, 0.0], g)
        else:
            aw, av = motion_p2c(*xl[i], *acc[p])
            cw, cv = motion_cross6(*vel[i], *joint_motion(i))
            aw, av = v_add(aw, cw), v_add(av, cv)
        acc.append(
            ([_lane(x, zero) for x in aw], [_lane(x, zero) for x in av])
        )
        m_i, h_i, I_i = inert[i]
        fa, fl = inertia_mul_motion(m_i, h_i, I_i, *acc[i])
        va, vl = inertia_mul_motion(m_i, h_i, I_i, *vel[i])
        ca, cl = force_cross6(*vel[i], va, vl)
        fb.append((v_add(fa, ca), v_add(fl, cl)))

    if w0 is not None:
        # external wrench on the root body: f[0] -= fext[0] (algos.rnea)
        fb[0] = (v_sub(fb[0][0], w0[:3]), v_sub(fb[0][1], w0[3:]))

    bias = [None] * nv
    for i in range(nb - 1, -1, -1):
        t = spec.joint_type[i]
        vo = spec.v_off[i]
        ang, lin = fb[i]
        if t == JT.FREE:
            for k in range(3):
                bias[vo + k] = lin[k]
                bias[vo + 3 + k] = ang[k]
        elif t == JT.SPHERICAL:
            for k in range(3):
                bias[vo + k] = ang[k]
        elif t == JT.REVOLUTE:
            ax = [float(a) for a in spec.axis[i]]
            bias[vo] = v_dot(ang, [lane(a) for a in ax])
        else:  # prismatic
            ax = [float(a) for a in spec.axis[i]]
            bias[vo] = v_dot(lin, [lane(a) for a in ax])
        p = spec.parent[i]
        if p >= 0:
            pa, pl = force_c2p(*xl[i], ang, lin)
            fb[p] = (v_add(fb[p][0], pa), v_add(fb[p][1], pl))

    # ---- CRBA mass matrix (algos.crba) + armature + implicit diag -------
    Ic = list(inert)
    M = [[None] * nv for _ in range(nv)]

    def dof_cols(i):
        """Motion-subspace columns of joint i as [(w, v), ...]."""
        t = spec.joint_type[i]
        if t == JT.FREE:
            cols = []
            for k in range(3):  # linear dofs
                e = [1.0 if j == k else 0.0 for j in range(3)]
                cols.append(([0.0, 0.0, 0.0], e))
            for k in range(3):  # angular dofs
                e = [1.0 if j == k else 0.0 for j in range(3)]
                cols.append((e, [0.0, 0.0, 0.0]))
            return cols
        if t == JT.SPHERICAL:
            return [
                (
                    [1.0 if j == k else 0.0 for j in range(3)],
                    [0.0, 0.0, 0.0],
                )
                for k in range(3)
            ]
        ax = [float(a) for a in spec.axis[i]]
        if t == JT.REVOLUTE:
            return [(ax, [0.0, 0.0, 0.0])]
        return [([0.0, 0.0, 0.0], ax)]

    for i in range(nb - 1, -1, -1):
        p = spec.parent[i]
        if p >= 0:
            ti = inertia_transform(*Ic[i], *xl[i])
            mp, hp, Ip = Ic[p]
            Ic[p] = (mp + ti[0], v_add(hp, ti[1]), m_add(Ip, ti[2]))
        cols = dof_cols(i)
        nvi = len(cols)
        vo_i = spec.v_off[i]
        F = [inertia_mul_motion(*Ic[i], *c) for c in cols]  # [(ang,lin)]
        for a in range(nvi):
            for b in range(nvi):
                # M[ii] = SᵀF: row a of Sᵀ dotted with F[b]
                w_a, v_a = cols[a]
                val = v_dot([lane(x) for x in w_a], F[b][0]) + v_dot(
                    [lane(x) for x in v_a], F[b][1]
                )
                M[vo_i + a][vo_i + b] = val
        j = i
        Fj = F
        while spec.parent[j] >= 0:
            Fj = [force_c2p(*xl[j], ang, lin) for ang, lin in Fj]
            j = spec.parent[j]
            cols_j = dof_cols(j)
            vo_j = spec.v_off[j]
            for a in range(nvi):
                for b in range(len(cols_j)):
                    w_b, v_b = cols_j[b]
                    val = v_dot(Fj[a][0], [lane(x) for x in w_b]) + v_dot(
                        Fj[a][1], [lane(x) for x in v_b]
                    )
                    M[vo_i + a][vo_j + b] = val
                    M[vo_j + b][vo_i + a] = val

    for r in range(nv):
        extra = arm[r] + dt * float(spec.damping[r]) \
            + dt * dt * float(spec.stiffness[r])
        for c2 in range(nv):
            if M[r][c2] is None:
                M[r][c2] = zero
        M[r][r] = M[r][r] + extra

    # ---- point Jacobians (algos.point_jacobian, lane-major) -------------
    def point_jac(b, pw):
        """World linear-velocity Jacobian (3, nv) of point pw on body b."""
        Jk = [[zero] * nv for _ in range(3)]
        j = b
        while j >= 0:
            R, o = xw[j]
            r_vec = v_sub(pw, o)
            for ci, (w_c, v_c) in enumerate(dof_cols(j)):
                ww = m_vec(R, [lane(x) for x in w_c])
                vv_ = m_vec(R, [lane(x) for x in v_c])
                lin = v_add(vv_, v_cross(ww, r_vec))
                col = spec.v_off[j] + ci
                for r in range(3):
                    Jk[r][col] = Jk[r][col] + lin[r]
            j = spec.parent[j]
        return Jk

    # ---- contact geometry + Jacobian rows --------------------------------
    # site centers in world frame; sphere sites (radius > 0) then offset
    # to the surface point center − r·n̂ BEFORE the Jacobians are taken,
    # so the rows carry the rolling lever arm (mirrors
    # contact.surface_contacts: same two-pass scheme, backends agree)
    centers = []
    for k in range(ncp):
        b = spec.contact_body[k]
        pl = [float(x) for x in spec.contact_pos[k]]
        centers.append(v_add(m_vec(xw[b][0], pl), xw[b][1]))

    pts = []
    for k in range(ncp):
        c = centers[k]
        r_k = spec.contact_radius[k]
        if r_k == 0.0:
            pts.append(c)
        elif use_general:
            _, gx, gy = gq(c[0], c[1])
            inv = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
            n1 = [-gx * inv, -gy * inv, inv]
            pts.append([c[r] - r_k * n1[r] for r in range(3)])
        else:
            pts.append([c[0], c[1], c[2] - r_k])  # flat: n̂ = e_z
    Jp = [point_jac(spec.contact_body[k], pts[k]) for k in range(ncp)]

    # ground query: depth + contact basis (t1, t2, n) per point.
    # flat: n=(0,0,1) ⇒ tangent_basis gives t1=(0,−1,0), t2=(1,0,0);
    # fourier/stairs: h/∇h as fused lane math (no gather), basis
    # mirroring cstr.tangent_basis exactly.
    depth = []
    basis = []  # per point: (t1, t2, n) — python floats for flat
    if use_general:
        for k in range(ncp):
            px, py, pz = pts[k]
            h, gx, gy = gq(px, py)
            inv = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
            nk = [-gx * inv, -gy * inv, inv]
            # cstr.tangent_basis: ref = e_z when |n_z| < 0.9 else e_x
            steep = inv < 0.9
            ref = [
                jnp.where(steep, 0.0, 1.0),
                zero,
                jnp.where(steep, 1.0, 0.0),
            ]
            t1 = v_cross(ref, nk)
            t1n = jax.lax.rsqrt(v_dot(t1, t1) + 1e-24)
            t1 = [t1[r] * t1n for r in range(3)]
            t2 = v_cross(nk, t1)
            depth.append(h - pz)
            basis.append((t1, t2, nk))
    else:
        for k in range(ncp):
            depth.append(lane(spec.ground_height) - pts[k][2])
            basis.append(
                ([0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0])
            )
    alpha = min(
        2.0 * np.pi * float(opts.contact_baumgarte_freq) * dt, 1.0
    )
    # penetrating: Baumgarte pushback; hovering within contact_margin:
    # velocity barrier depth/dt (continuous activation — mirrors
    # engine._impulse_substep; see EngineOptions.contact_margin)
    v_corr = [
        jnp.where(
            depth[k] > 0.0,
            jnp.clip(
                (alpha / dt) * (depth[k] - float(opts.contact_slop)),
                0.0,
                float(opts.contact_max_correction_vel),
            ),
            depth[k] * (1.0 / dt),
        )
        for k in range(ncp)
    ]

    # ---- stacked rows in engine order: equality constraints, then
    # bounds, then contacts color-major (mirrors cstr.assemble + engine)
    rows_J: list[list] = []  # each row: list of nv lane values
    target: list = []
    active: list = []
    for b1, p1l, b2, p2l, dist0, freq in spec.dist_constraints:
        # world-anchored frames (body -1) are absolute constants —
        # mirrors constraints.DistanceConstraint.rows; point_jac of a
        # negative body is the zero row by construction
        p1 = (
            [lane(x) for x in p1l] if b1 < 0
            else v_add(m_vec(xw[b1][0], p1l), xw[b1][1])
        )
        p2 = (
            [lane(x) for x in p2l] if b2 < 0
            else v_add(m_vec(xw[b2][0], p2l), xw[b2][1])
        )
        d_vec = v_sub(p1, p2)
        d = jnp.sqrt(v_dot(d_vec, d_vec) + 1e-24)
        u_vec = [d_vec[r] / jnp.maximum(d, 1e-9) for r in range(3)]
        J1, J2 = point_jac(b1, p1), point_jac(b2, p2)
        rows_J.append(
            [
                sum(u_vec[r] * (J1[r][c2] - J2[r][c2]) for r in range(3))
                for c2 in range(nv)
            ]
        )
        a_c = min(2.0 * np.pi * freq * dt, 1.0)
        target.append(-(a_c / dt) * (d - dist0))
        active.append(one)
    alpha_b = min(
        2.0 * np.pi * float(opts.bounds_baumgarte_freq) * dt, 1.0
    )
    for i in spec.bounded_joints:
        qo, vo = spec.q_off[i], spec.v_off[i]
        lo, hi = float(spec.q_min[qo]), float(spec.q_max[qo])
        d_lo = q[qo] - lo
        d_hi = hi - q[qo]
        sgn = jnp.where(d_lo < d_hi, 1.0, -1.0)
        dist = jnp.minimum(d_lo, d_hi)
        row = [zero] * nv
        row[vo] = sgn
        rows_J.append(row)
        target.append(
            jnp.where(dist < 0, -alpha_b * dist, -dist) / dt
        )
        active.append(one)
    for k in spec.color_order:
        Jk = Jp[k]
        if use_general:
            t1, t2, nk = basis[k]
            for d in (t1, t2, nk):
                rows_J.append(
                    [
                        d[0] * Jk[0][c2] + d[1] * Jk[1][c2]
                        + d[2] * Jk[2][c2]
                        for c2 in range(nv)
                    ]
                )
        else:
            # flat rows [t1; t2; n] = [−J_y; J_x; J_z]
            rows_J.append([-x for x in Jk[1]])
            rows_J.append(Jk[0])
            rows_J.append(Jk[2])
        target.extend([zero, zero, v_corr[k]])
        a_k = jnp.where(
            depth[k] > -float(opts.contact_margin), 1.0, 0.0
        )
        active.extend([a_k, a_k, a_k])

    # ---- declared collision pairs: branchless narrow phases + one
    # [t1, t2, n] block per CONTACT (pairs span one color each),
    # mirroring engine/collision.pair_rows exactly so backends agree
    mu_pairs = []

    def world_pt(b, pl):
        pt = v_add(m_vec(xw[b][0], pl), xw[b][1])
        return [lane(x) for x in pt]

    def emit_pair_contact(bp, sa, bf, sb, nk, depth_k, mu_k):
        """Shared row math (collision._contact_rows lane-major)."""
        cnd = jnp.abs(nk[0]) < 0.9
        ref = [
            jnp.where(cnd, 1.0, 0.0),
            jnp.where(cnd, 0.0, 1.0),
            zero,
        ]
        t1 = v_cross(nk, ref)
        t1n = jax.lax.rsqrt(v_dot(t1, t1) + 1e-18)
        t1 = [t1[r] * t1n for r in range(3)]
        t2 = v_cross(nk, t1)
        Ja = point_jac(bp, sa)
        Jb = point_jac(bf, sb)
        Jrel = [
            [Ja[r][c2] - Jb[r][c2] for c2 in range(nv)]
            for r in range(3)
        ]
        for dvec_ in (t1, t2, nk):
            rows_J.append(
                [
                    dvec_[0] * Jrel[0][c2] + dvec_[1] * Jrel[1][c2]
                    + dvec_[2] * Jrel[2][c2]
                    for c2 in range(nv)
                ]
            )
        v_corr_k = jnp.where(
            depth_k > 0.0,
            jnp.clip(
                (alpha / dt) * (depth_k - float(opts.contact_slop)),
                0.0,
                float(opts.contact_max_correction_vel),
            ),
            depth_k * (1.0 / dt),
        )
        target.extend([zero, zero, v_corr_k])
        a_k = jnp.where(
            depth_k > -float(opts.contact_margin), 1.0, 0.0
        )
        active.extend([a_k, a_k, a_k])
        mu_pairs.extend([lane(mu_k)] * 3)

    for kind, g in spec.pair_gens:
        if kind == "seg":
            pa0 = world_pt(g["ba"], g["a0"])
            pa1 = world_pt(g["ba"], g["a1"])
            pb0 = world_pt(g["bb"], g["b0"])
            pb1 = world_pt(g["bb"], g["b1"])
            ca, cb = _seg_seg_lane(pa0, pa1, pb0, pb1)
            d_vec = v_sub(ca, cb)
            dist = jnp.sqrt(v_dot(d_vec, d_vec) + 1e-18)
            nk = [d_vec[r] / dist for r in range(3)]  # from B toward A
            depth_k = (g["ra"] + g["rb"]) - dist
            sa = [ca[r] - g["ra"] * nk[r] for r in range(3)]
            sb = [cb[r] + g["rb"] * nk[r] for r in range(3)]
            emit_pair_contact(
                g["ba"], sa, g["bb"], sb, nk, depth_k, g["mu"]
            )
        elif kind == "ptbox":
            bp, bf, rp = g["bp"], g["bf"], g["rp"]
            c_w = world_pt(bf, g["c"])
            Rw = m_mul(xw[bf][0], g["R"])  # box orientation in world
            for pl_b in g["pts"]:
                pw = world_pt(bp, pl_b)
                rel = v_sub(pw, c_w)
                pl = m_tvec(Rw, rel)  # box frame
                # exact box SDF + outward normal (collision.box_sdf)
                h = g["h"]
                qd = [jnp.abs(pl[r]) - h[r] for r in range(3)]
                out = [jnp.maximum(qd[r], 0.0) for r in range(3)]
                d_out = jnp.sqrt(v_dot(out, out) + 1e-18)
                mmax = jnp.maximum(jnp.maximum(qd[0], qd[1]), qd[2])
                sdf = d_out + jnp.minimum(mmax, 0.0)
                sgn = [
                    jnp.where(pl[r] >= 0, 1.0, -1.0) for r in range(3)
                ]
                g_out = [sgn[r] * out[r] / d_out for r in range(3)]
                one = [
                    jnp.where(qd[r] >= mmax - 1e-12, 1.0, 0.0)
                    for r in range(3)
                ]
                tot = one[0] + one[1] + one[2]
                g_in = [sgn[r] * one[r] / tot for r in range(3)]
                inside = mmax < 0.0
                n_l = [
                    jnp.where(inside, g_in[r], g_out[r])
                    for r in range(3)
                ]
                n_w = m_vec(Rw, n_l)
                depth_k = rp - sdf
                sa = [pw[r] - rp * n_w[r] for r in range(3)]
                sb = [pw[r] - sdf * n_w[r] for r in range(3)]
                emit_pair_contact(bp, sa, bf, sb, n_w, depth_k, g["mu"])
        else:  # ptseg
            bp, bf, rp, rs = g["bp"], g["bf"], g["rp"], g["rs"]
            p0w = world_pt(bf, g["p0"])
            p1w = world_pt(bf, g["p1"])
            seg = v_sub(p1w, p0w)
            denom = jnp.maximum(v_dot(seg, seg), 1e-12)
            for pl_b in g["pts"]:
                pw = world_pt(bp, pl_b)
                s_t = jnp.clip(
                    v_dot(v_sub(pw, p0w), seg) / denom, 0.0, 1.0
                )
                cpt = [p0w[r] + s_t * seg[r] for r in range(3)]
                d_vec = v_sub(pw, cpt)
                dist = jnp.sqrt(v_dot(d_vec, d_vec) + 1e-18)
                nk = [d_vec[r] / dist for r in range(3)]
                depth_k = (rp + rs) - dist
                sa = [pw[r] - rp * nk[r] for r in range(3)]
                sb = [cpt[r] + rs * nk[r] for r in range(3)]
                emit_pair_contact(bp, sa, bf, sb, nk, depth_k, g["mu"])

    nc = len(rows_J)
    assert nc == cfg.nc, (nc, cfg.nc)
    mu_row = (
        [lane(0.0)] * (len(spec.dist_constraints)
                       + len(spec.bounded_joints))
        + [lane(spec.friction)] * (3 * ncp)
        + mu_pairs
    )

    # ---- shared solve chain (lane-major stacked arrays) -----------------
    tau_adj = [
        tau[r] - dt * float(spec.stiffness[r]) * v[r] for r in range(nv)
    ]
    p_free = [tau_adj[r] - bias[r] for r in range(nv)]
    T_ref[...] = jnp.stack([jnp.stack(row) for row in M])
    pv = jnp.stack(p_free)
    vv = jnp.stack(v)
    Jt = jnp.stack(
        [jnp.stack([rows_J[r][kcol] for r in range(nc)]) for kcol in
         range(nv)]
    )  # (nv, nc, S, 128)
    tgt = jnp.stack(target)
    mu = jnp.stack(mu_row)
    act = jnp.stack(active)

    v_next, lam_out, res = _solve_chain(
        cfg, pv, vv, Jt, tgt, mu, act, lam0, T_ref, L_ref, X_ref, A_ref
    )
    vn = [v_next[r] for r in range(nv)]

    # ---- contact impulses in world frame, ORIGINAL contact order --------
    # (replaces the host-side color-order permutation + flat-basis
    # reconstruction: the kernel knows the per-point basis)
    if ncp:
        c_off = len(spec.dist_constraints) + len(spec.bounded_joints)
        fc_rows = [None] * (3 * ncp)
        for j, k in enumerate(spec.color_order):
            l1 = lam_out[c_off + 3 * j]
            l2 = lam_out[c_off + 3 * j + 1]
            l3 = lam_out[c_off + 3 * j + 2]
            if use_general:
                t1, t2, nk = basis[k]
                for r in range(3):
                    fc_rows[3 * k + r] = (
                        t1[r] * l1 + t2[r] * l2 + nk[r] * l3
                    )
            else:
                # t1=(0,−1,0), t2=(1,0,0), n=(0,0,1)
                fc_rows[3 * k + 0] = l2
                fc_rows[3 * k + 1] = -l1
                fc_rows[3 * k + 2] = l3
        fc = jnp.stack(fc_rows)
    else:
        fc = None

    # ---- integrate (algos.integrate, euler_symplectic) ------------------
    def quat_step(quat, wx, wy, wz):
        """so3.quat_integrate: q ⊗ exp(ω dt / 2), renormalized."""
        wx, wy, wz = wx * dt, wy * dt, wz * dt
        ang2 = wx * wx + wy * wy + wz * wz
        ang = jnp.sqrt(ang2 + 1e-24)
        half = 0.5 * ang
        sin_h = jnp.sin(half)
        cos_h = jnp.cos(half)
        scale = sin_h / ang
        ex, ey, ez, ew = wx * scale, wy * scale, wz * scale, cos_h
        qx, qy, qz, qw = quat
        # quaternion product q ⊗ e (xyzw)
        nx = qw * ex + qx * ew + qy * ez - qz * ey
        ny = qw * ey - qx * ez + qy * ew + qz * ex
        nz = qw * ez + qx * ey - qy * ex + qz * ew
        nw = qw * ew - qx * ex - qy * ey - qz * ez
        norm = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + nw * nw)
        return [nx * norm, ny * norm, nz * norm, nw * norm]

    q_next = list(q)
    for i in range(nb):
        t = spec.joint_type[i]
        qo, vo = spec.q_off[i], spec.v_off[i]
        if t == JT.FREE:
            Rb = quat_to_m([q[qo + 3], q[qo + 4], q[qo + 5], q[qo + 6]])
            dp = m_vec(Rb, [vn[vo] * dt, vn[vo + 1] * dt, vn[vo + 2] * dt])
            for k in range(3):
                q_next[qo + k] = q[qo + k] + dp[k]
            q_next[qo + 3: qo + 7] = quat_step(
                [q[qo + 3], q[qo + 4], q[qo + 5], q[qo + 6]],
                vn[vo + 3], vn[vo + 4], vn[vo + 5],
            )
        elif t == JT.SPHERICAL:
            q_next[qo: qo + 4] = quat_step(
                [q[qo], q[qo + 1], q[qo + 2], q[qo + 3]],
                vn[vo], vn[vo + 1], vn[vo + 2],
            )
        else:
            q_next[qo] = q[qo] + vn[vo] * dt

    return q_next, v_next, lam_out, res, fc


def _ground_query(spec: SubstepSpec, gc_ref):
    """Per-env ground-coefficient block → ``(px, py) → (h, ∂h/∂x,
    ∂h/∂y)`` lane closure, mirroring the corresponding Ground.query
    (engine/ground.py) exactly. None for flat ground."""
    if spec.ground_mode == "flat":
        return None
    if spec.ground_mode == "fourier":
        K = spec.n_fourier
        g_amp = [gc_ref[j, 0] for j in range(K)]
        g_kx = [gc_ref[K + j, 0] for j in range(K)]
        g_ky = [gc_ref[2 * K + j, 0] for j in range(K)]
        g_ph = [gc_ref[3 * K + j, 0] for j in range(K)]
        h0 = float(spec.ground_height)

        def gq(px, py):
            h = jnp.full_like(px, jnp.float32(h0))
            gx = jnp.zeros_like(px)
            gy = jnp.zeros_like(px)
            for j in range(K):
                arg = g_kx[j] * px + g_ky[j] * py + g_ph[j]
                s, c = jnp.sin(arg), jnp.cos(arg)
                h = h + g_amp[j] * s
                gx = gx + g_amp[j] * g_kx[j] * c
                gy = gy + g_amp[j] * g_ky[j] * c
            return h, gx, gy

        return gq
    if spec.ground_mode == "perlin":
        # [seed, freq, amp]: analytic fBm gradient noise — same math as
        # engine/ground.py PerlinGround.query (hash/fade/corner dots),
        # here on lane values; CLAUDE.md rule 8 applies (no fancy
        # getitems), but everything is elementwise so nothing to split
        from jiminy_tpu.engine.ground import (
            _PERLIN_OCTAVE_STD,
        )

        seed_f, freq, amp = (gc_ref[j, 0] for j in range(3))
        seed = seed_f.astype(jnp.int32)
        octaves = spec.n_fourier
        s = sum((0.5**o) ** 2 for o in range(octaves))
        norm = 1.0 / (_PERLIN_OCTAVE_STD * float(np.sqrt(s)))
        h0 = float(spec.ground_height)

        def hash2(ix, iy, sd):
            hh = (
                ix * jnp.int32(0x27D4EB2D)
                + iy * jnp.int32(0x165667B1)
                + sd
            )
            hh = hh ^ ((hh >> 15) & jnp.int32(0x1FFFF))
            hh = hh * jnp.int32(0x2545F491)
            hh = hh ^ ((hh >> 13) & jnp.int32(0x7FFFF))
            return hh

        def octave(px, py, sd):
            ix = jnp.floor(px)
            iy = jnp.floor(py)
            xf = px - ix
            yf = py - iy
            ixi = ix.astype(jnp.int32)
            iyi = iy.astype(jnp.int32)

            def corner(di, dj):
                hh = hash2(ixi + di, iyi + dj, sd)
                sx = jnp.where((hh & 1) == 0, 1.0, -1.0)
                sy = jnp.where((hh & 2) == 0, 1.0, -1.0)
                return sx * (xf - di) + sy * (yf - dj), sx, sy

            n00, sx00, sy00 = corner(0, 0)
            n10, sx10, sy10 = corner(1, 0)
            n01, sx01, sy01 = corner(0, 1)
            n11, sx11, sy11 = corner(1, 1)
            u = xf * xf * xf * (xf * (xf * 6.0 - 15.0) + 10.0)
            v = yf * yf * yf * (yf * (yf * 6.0 - 15.0) + 10.0)
            tu = xf * (xf - 1.0)
            tv = yf * (yf - 1.0)
            du = 30.0 * tu * tu
            dv = 30.0 * tv * tv
            nx0 = n00 + u * (n10 - n00)
            nx1 = n01 + u * (n11 - n01)
            hval = nx0 + v * (nx1 - nx0)
            dnx0_dx = sx00 + u * (sx10 - sx00) + du * (n10 - n00)
            dnx1_dx = sx01 + u * (sx11 - sx01) + du * (n11 - n01)
            gx = dnx0_dx + v * (dnx1_dx - dnx0_dx)
            dnx0_dy = sy00 + u * (sy10 - sy00)
            dnx1_dy = sy01 + u * (sy11 - sy01)
            gy = dnx0_dy + v * (dnx1_dy - dnx0_dy) + dv * (nx1 - nx0)
            return hval, gx, gy

        def gq(px, py):
            scale = amp * norm
            h = jnp.full_like(px, jnp.float32(h0))
            gx = jnp.zeros_like(px)
            gy = jnp.zeros_like(px)
            for o in range(octaves):
                f_o = freq * float(2.0**o)
                w_o = scale * float(0.5**o)
                ho, gxo, gyo = octave(
                    px * f_o, py * f_o, seed + jnp.int32(1013 * o)
                )
                h = h + w_o * ho
                gx = gx + w_o * f_o * gxo
                gy = gy + w_o * f_o * gyo
            return h, gx, gy

        return gq
    # stairs: [step_width, step_height, n_steps, ramp, x0]
    w, H, n, ramp, x0 = (gc_ref[j, 0] for j in range(5))

    def gq(px, py):
        u = px - x0
        k = jnp.floor(u / w)
        t = (u - k * w) / ramp
        tc = jnp.clip(t, 0.0, 1.0)
        s = jnp.clip(k + tc, 0.0, n)
        h = H * s
        inner = (t > 0.0) & (t < 1.0) & (k + tc > 0.0) & (k + tc < n)
        gx = jnp.where(inner, H / ramp, 0.0)
        return h, gx, jnp.zeros_like(px)

    return gq


# ---------------------------------------------------------------------------
# In-kernel sensor stage (reference: sensor refresh at its own period
# inside the stepper loop, SURVEY.md §2.1 "Engine"/"Sensors"; §2.7 item 4:
# delay ring buffers updated IN-KERNEL)
# ---------------------------------------------------------------------------


class SensorKernelSpec:
    """Static lane description of a hardware.SensorSuite so the fused
    multi-substep kernel can measure + corrupt + ring-push every
    ``k_obs`` substeps without leaving VMEM. Supported types: imu,
    encoder, effort, contact (force gates the fused path off). Noise is
    PRE-SAMPLED outside (eps = bias [+ bias_extra] + noise_std·normal,
    exactly SensorSuite._corrupt's realization) and streamed in as one
    traced input, so the kernel stays RNG-free."""

    def __init__(self, tree, suite, k_obs: int):
        from jiminy_tpu.hardware.sensors import NOISE_DIMS, SENSOR_DIMS

        self.k_obs = int(k_obs)
        # snapshot to NUMPY before any per-element indexing: this spec
        # may be built lazily INSIDE a jit trace (e.g. the randomized
        # variant on the first step(model_params=...)), where indexing
        # a concrete jnp constant lifts it to a tracer and float() dies
        fp_rot = np.asarray(tree.fp_rot)
        fp_pos = np.asarray(tree.fp_pos)
        frame_body = [int(b) for b in np.asarray(tree.frame_body)]
        contact_body = [int(b) for b in np.asarray(tree.contact_body)]
        self.groups = []
        for g in suite.groups:
            if g.type not in ("imu", "encoder", "effort", "contact"):
                raise ValueError(
                    f"sensor type {g.type!r} unsupported in-kernel"
                )
            entry = {
                "type": g.type,
                "ns": g.ns,
                "buf_len": int(g.buf_len),
                "dim": SENSOR_DIMS[g.type],
                "ndim": NOISE_DIMS[g.type],
            }
            if g.type == "imu":
                tg = []
                for f in g.target:
                    b = frame_body[f]
                    if b < 0:
                        raise ValueError("imu on a world frame")
                    Rfp = [[float(fp_rot[f][r][c]) for c in range(3)]
                           for r in range(3)]
                    pfp = [float(x) for x in fp_pos[f]]
                    tg.append((b, Rfp, pfp))
                entry["targets"] = tg
            elif g.type in ("encoder", "effort"):
                entry["targets"] = [
                    (int(tree.q_off[j]), int(tree.v_off[j]))
                    for j in g.target
                ]
            else:  # contact
                entry["targets"] = [
                    (int(k), contact_body[k]) for k in g.target
                ]
            self.groups.append(entry)
        self.n_buf = sum(
            g["ns"] * g["buf_len"] * g["dim"] for g in self.groups
        )
        self.n_eps = sum(g["ns"] * g["ndim"] for g in self.groups)


def _quat_from_m_lane(R):
    """matrix_to_quat (so3.py 4-candidate construction) on lane mat3 —
    elementwise selection replaces argmax. Returns [x, y, z, w]."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    cands = [
        # dominant x
        ([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], m00),
        # dominant y
        ([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], m11),
        # dominant z
        ([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], m22),
        # dominant w
        ([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], tr),
    ]
    best, bs = cands[0]
    for cand, s in cands[1:]:
        take = s > bs
        best = [jnp.where(take, cand[k], best[k]) for k in range(4)]
        bs = jnp.maximum(bs, s)
    n = jax.lax.rsqrt(sum(c * c for c in best) + 1e-24)
    best = [c * n for c in best]
    sgn = jnp.where(best[3] >= 0.0, 1.0, -1.0)
    return [c * sgn for c in best]


def _quat_exp_lane(rv):
    """so3.quat_exp on a lane rotation vector → [x, y, z, w]."""
    a2 = rv[0] * rv[0] + rv[1] * rv[1] + rv[2] * rv[2]
    ang = jnp.sqrt(a2 + 1e-24)
    half = 0.5 * ang
    s = jnp.sin(half) / ang
    return [rv[0] * s, rv[1] * s, rv[2] * s, jnp.cos(half)]


def _quat_mul_lane(a, b):
    """Hamilton product a ⊗ b, xyzw lanes (so3.quat_mul)."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ]


def _sensor_stage(spec: SubstepSpec, q, v, a, fc, tau, eps, bufs,
                  commit, zero):
    """One in-kernel sensor update at the ACCEPTED state (q, v, a, the
    substep's contact forces fc = impulses/dt as nv/3·ncp lane lists,
    applied torque tau): measure (SensorSuite._measure_group), corrupt
    with the pre-sampled ``eps`` lanes (_corrupt), and ring-push into
    ``bufs`` (a flat lane list, [group][sensor][slot][dim] order).
    ``commit`` is None (always push — k_obs == 1) or a lane mask for
    conditional pushes. Returns the new flat buffer lane list.

    Cost note: with k_obs > 1 the measurement (a second lane FK +
    acceleration propagation) still runs EVERY substep and is masked
    out on non-boundary iterations — branchless by design (Mosaic
    predication would evaluate both arms of a cond anyway). The
    shipped walkers sample sensors at the physics rate (k_obs == 1),
    where nothing is wasted; slow-sensor robots pay ~2× kernel FK and
    may prefer the chunked fallback (set env._fused_sensors = False)."""
    sspec = spec.sensors
    xl, xw, vel = _lane_fk(spec, q, v, zero)

    # body proper accelerations (algos.body_accelerations): forward
    # propagation with a0 = [0; −gravity]
    g = [float(-x) for x in spec.gravity]
    acc = []
    for i in range(spec.nb):
        p = spec.parent[i]
        wj_a, vj_a = _lane_joint_motion(spec, i, a, zero)
        wj_v, vj_v = _lane_joint_motion(spec, i, v, zero)
        if p < 0:
            aw, av = motion_p2c(*xl[i], [0.0, 0.0, 0.0], g)
        else:
            aw, av = motion_p2c(*xl[i], *acc[p])
        aw = v_add(aw, wj_a)
        av = v_add(av, vj_a)
        if p >= 0:
            cw, cv = motion_cross6(*vel[i], wj_v, vj_v)
            aw, av = v_add(aw, cw), v_add(av, cv)
        acc.append(
            ([_lane(x, zero) for x in aw], [_lane(x, zero) for x in av])
        )

    out = list(bufs)
    boff = 0
    eoff = 0
    for gr in sspec.groups:
        ns, buf_len, dim, ndim = (
            gr["ns"], gr["buf_len"], gr["dim"], gr["ndim"]
        )
        for s in range(ns):
            e = eps[eoff + s * ndim: eoff + (s + 1) * ndim]
            if gr["type"] == "imu":
                b, Rfp, pfp = gr["targets"][s]
                Rw = m_mul(xw[b][0], Rfp)
                quat = _quat_from_m_lane(Rw)
                w_b, v_b = vel[b]
                al_b, aa_b = acc[b]
                # classical proper acceleration of the frame origin
                a_pt = v_add(
                    v_add(aa_b, v_cross(w_b, v_b)),
                    v_add(
                        v_cross(al_b, pfp),
                        v_cross(w_b, v_cross(w_b, pfp)),
                    ),
                )
                gyro = m_tvec(Rfp, w_b)
                accel = m_tvec(Rfp, a_pt)
                quat = _quat_mul_lane(quat, _quat_exp_lane(e[0:3]))
                row = (
                    quat
                    + [gyro[k] + e[3 + k] for k in range(3)]
                    + [accel[k] + e[6 + k] for k in range(3)]
                )
            elif gr["type"] == "encoder":
                qo, vo = gr["targets"][s]
                row = [q[qo] + e[0], v[vo] + e[1]]
            elif gr["type"] == "effort":
                _, vo = gr["targets"][s]
                row = [tau[vo] + e[0]]
            else:  # contact: world force → carrier-body frame
                k, b = gr["targets"][s]
                fw = [fc[3 * k], fc[3 * k + 1], fc[3 * k + 2]]
                fb = m_tvec(xw[b][0], fw)
                row = [fb[r] + e[r] for r in range(3)]
            # ring push: new sample at slot 0, previous slots shift
            base = boff + s * buf_len * dim
            pushed = row + bufs[base: base + (buf_len - 1) * dim]
            if commit is None:
                out[base: base + buf_len * dim] = pushed
            else:
                out[base: base + buf_len * dim] = [
                    jnp.where(commit, nv_, ov_)
                    for nv_, ov_ in zip(
                        pushed, bufs[base: base + buf_len * dim]
                    )
                ]
        boff += ns * buf_len * dim
        eoff += ns * ndim
    return out


def _substep_body(spec: SubstepSpec, refs):
    """Single-substep kernel body: refs → _substep_math → refs."""
    refs = list(refs)
    q_ref, v_ref, tau_ref, lam0_ref = refs[:4]
    del refs[:4]
    gq = _ground_query(spec, refs.pop(0)) if spec.n_gc else None
    w0 = None
    if spec.base_wrench:
        w_ref = refs.pop(0)
        w0 = [w_ref[j, 0] for j in range(6)]
    mp = None
    if spec.randomized:
        inert, arm, _, _ = _unpack_mp(spec, refs.pop(0))
        mp = (inert, arm)
    (qn_ref, vn_ref, lam_ref, res_ref, fc_ref,
     T_ref, L_ref, X_ref, A_ref) = refs
    q = [q_ref[i, 0] for i in range(spec.nq)]
    v = [v_ref[i, 0] for i in range(spec.nv)]
    tau = [tau_ref[i, 0] for i in range(spec.nv)]
    q_next, v_next, lam_out, res, fc = _substep_math(
        spec, q, v, tau, lam0_ref[:, 0], gq, T_ref, L_ref, X_ref, A_ref,
        w0=w0, mp=mp,
    )
    qn_ref[:, 0] = jnp.stack(q_next)
    vn_ref[:, 0] = v_next
    lam_ref[:, 0] = lam_out
    res_ref[0, 0] = res
    if fc is not None:
        fc_ref[:, 0] = fc
    else:
        fc_ref[0, 0] = jnp.zeros_like(q[0])


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _lane_kernel_call(spec: SubstepSpec, kernel_body, inputs, out_dims,
                      interpret=None):
    """Shared host-side plumbing for both whole-substep kernels: pad the
    batch to a (S·128) tile multiple, pack every (B, d) input lane-major,
    run ``kernel_body`` through pallas_call with the standard scratch set
    (T, L, X, A), and unpack the (d, G, S, 128) outputs back to (B, d).

    ``inputs``: list of (array (B, d), pad_mode) where pad_mode is
    "repeat" (tile row 0 — neutral configuration / shared coefficients)
    or "zero". Keeping this in ONE place guarantees the single- and
    multi-substep paths can never desynchronize on padding or layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, nc = spec.nv, spec.cfg.nc
    B = inputs[0][0].shape[0]
    S = _pick_sublanes(n, nc)
    tile = S * LANES
    Bp = -(-B // tile) * tile
    G = Bp // tile
    pad = Bp - B
    f32 = jnp.float32

    def mk_spec(d):
        return pl.BlockSpec(
            (d, 1, S, LANES),
            lambda g: (0, g, 0, 0),
            memory_space=pltpu.VMEM,
        )

    packed, in_specs = [], []
    for arr, mode in inputs:
        arr = arr.astype(f32)
        if pad:
            fill = (
                jnp.tile(arr[:1], (pad, 1)) if mode == "repeat"
                else jnp.zeros((pad, arr.shape[1]), f32)
            )
            arr = jnp.concatenate([arr, fill], axis=0)
        packed.append(_to_lane_major(arr, 0, G, S))
        in_specs.append(mk_spec(arr.shape[1]))

    outs = pl.pallas_call(
        kernel_body,
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple(mk_spec(d) for d in out_dims),
        out_shape=tuple(
            jax.ShapeDtypeStruct((d, G, S, LANES), f32) for d in out_dims
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, S, LANES), f32),
            pltpu.VMEM((n, n, S, LANES), f32),
            pltpu.VMEM((n, nc + 1, S, LANES), f32),
            pltpu.VMEM((nc, nc, S, LANES), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*packed)

    def back(x):
        d = x.shape[0]
        return x.reshape(d, Bp).T[:B]

    return [back(o) for o in outs]


def _check_kernel_inputs(spec: SubstepSpec, gcoef, wrench, mp=None):
    if (spec.n_gc > 0) != (gcoef is not None):
        raise ValueError("gcoef required iff the ground has per-env "
                         "coefficients (fourier/stairs)")
    if spec.base_wrench != (wrench is not None):
        raise ValueError("wrench (B,6) required iff spec.base_wrench")
    if spec.randomized != (mp is not None):
        raise ValueError("mp (B,n_mp) required iff spec.randomized")


def substep_batched_pallas(spec: SubstepSpec, q, v, tau, lam0, gcoef=None,
                           wrench=None, mp=None, interpret=None):
    """Batched whole substep: q (B,nq), v/tau (B,nv), lam0 (B,nc)
    [+ gcoef when spec.n_gc > 0 — (B,4K) Fourier coefficients
    (amp ‖ kx ‖ ky ‖ phase) or (B,5) stairs parameters (width ‖ height ‖
    n_steps ‖ ramp ‖ x0)] [+ wrench (B,6) LOCAL [ang; lin] root-body
    spatial wrench when spec.base_wrench] [+ mp (B,n_mp) packed per-env
    model parameters when spec.randomized — SubstepSpec.n_mp layout] →
    (q_next, v_next, λ, residual, f_contact (B,ncp,3) world impulses)."""
    _check_kernel_inputs(spec, gcoef, wrench, mp)
    n, nc, nq, ncp = spec.nv, spec.cfg.nc, spec.nq, spec.ncp
    nfc = max(3 * ncp, 1)
    B = q.shape[0]
    inputs = [(q, "repeat"), (v, "zero"), (tau, "zero"), (lam0, "zero")]
    if gcoef is not None:
        inputs.append((gcoef, "repeat"))
    if wrench is not None:
        inputs.append((wrench, "zero"))
    if mp is not None:
        inputs.append((mp, "repeat"))
    qn, vn, lam, res, fc = _lane_kernel_call(
        spec, lambda *refs: _substep_body(spec, refs), inputs,
        (nq, n, nc, 1, nfc), interpret,
    )
    f_contact = (
        fc.reshape(B, ncp, 3) if ncp
        else jnp.zeros((B, 0, 3), jnp.float32)
    )
    return qn, vn, lam, res[:, 0], f_contact


# ---------------------------------------------------------------------------
# Multi-substep persistence: N substeps in ONE kernel launch
# ---------------------------------------------------------------------------


def _substep_multi_body(spec: SubstepSpec, n_sub: int, refs):
    """``n_sub`` chained substeps in one launch: (q, v, λ) stay
    VMEM-resident in a ``fori_loop`` carry and τ is recomputed from the
    zero-order-hold command between substeps via ``spec.torque`` — this
    removes both the per-substep launch overhead and the XLA torque
    cloud between launches (docs/tpu_performance.md "multi-substep
    persistence" headroom). Extra outputs (a, τ) are the LAST substep's
    accepted acceleration and applied torque (SimState.a/tau — the
    sensor suite's inputs)."""
    refs = list(refs)
    q_ref, v_ref, cmd_ref, lam0_ref = refs[:4]
    del refs[:4]
    gq = _ground_query(spec, refs.pop(0)) if spec.n_gc else None
    w0 = None
    if spec.base_wrench:
        w_ref = refs.pop(0)
        w0 = [w_ref[j, 0] for j in range(6)]
    mp = mscale = None
    if spec.randomized:
        inert, arm, gain, fric = _unpack_mp(spec, refs.pop(0))
        mp = (inert, arm)
        mscale = (gain, fric)
    sens = spec.sensors
    buf_ref = eps_ref = bufo_ref = None
    if sens is not None:
        buf_ref = refs.pop(0)
        eps_ref = refs.pop(0)
        (qn_ref, vn_ref, lam_ref, res_ref, fc_ref, a_ref, tauo_ref,
         bufo_ref, T_ref, L_ref, X_ref, A_ref) = refs
    else:
        (qn_ref, vn_ref, lam_ref, res_ref, fc_ref, a_ref, tauo_ref,
         T_ref, L_ref, X_ref, A_ref) = refs
    nq, nv = spec.nq, spec.nv
    inv_dt = 1.0 / float(spec.cfg.dt)
    cmd = [cmd_ref[m, 0] for m in range(spec.torque.nm)]

    def body(i, carry):
        if sens is not None:
            qs, vs, lams, bufs_arr, eps_arr = carry
        else:
            qs, vs, lams = carry
        q = [qs[j] for j in range(nq)]
        v = [vs[j] for j in range(nv)]
        tau = _compute_tau(spec, q, v, cmd, mscale=mscale)
        q_next, v_next, lam_out, res, fc = _substep_math(
            spec, q, v, tau, lams, gq, T_ref, L_ref, X_ref, A_ref,
            w0=w0, mp=mp,
        )
        # per-iteration output writes: the LAST substep's values survive
        res_ref[0, 0] = res
        if fc is not None:
            fc_ref[:, 0] = fc
        else:
            fc_ref[0, 0] = jnp.zeros_like(qs[0])
        a_stk = (v_next - vs) * inv_dt
        a_ref[:, 0] = a_stk
        tauo_ref[:, 0] = jnp.stack(tau)
        if sens is None:
            return jnp.stack(q_next), v_next, lam_out
        # ---- in-kernel sensor update at the ACCEPTED state ----------
        zero = jnp.zeros_like(qs[0])
        k_obs = sens.k_obs
        commit = None if k_obs == 1 else ((i + 1) % k_obs == 0)
        a_l = [a_stk[r] for r in range(nv)]
        v_l = [v_next[r] for r in range(nv)]
        fc_force = (
            [fc[j] * inv_dt for j in range(3 * spec.ncp)]
            if fc is not None else []
        )
        new_bufs = _sensor_stage(
            spec, q_next, v_l, a_l, fc_force, tau,
            [eps_arr[j] for j in range(sens.n_eps)],
            [bufs_arr[j] for j in range(sens.n_buf)],
            commit, zero,
        )
        bufs_arr = jnp.stack(new_bufs)
        shifted = jnp.concatenate(
            [eps_arr[sens.n_eps:], jnp.zeros_like(eps_arr[:sens.n_eps])]
        )
        eps_arr = (
            shifted if commit is None
            else jnp.where(commit, shifted, eps_arr)
        )
        return jnp.stack(q_next), v_next, lam_out, bufs_arr, eps_arr

    if sens is not None:
        qs, vs, lams, bufs_arr, _ = jax.lax.fori_loop(
            0, n_sub, body,
            (q_ref[:, 0], v_ref[:, 0], lam0_ref[:, 0],
             buf_ref[:, 0], eps_ref[:, 0]),
        )
        bufo_ref[:, 0] = bufs_arr
    else:
        qs, vs, lams = jax.lax.fori_loop(
            0, n_sub, body, (q_ref[:, 0], v_ref[:, 0], lam0_ref[:, 0])
        )
    qn_ref[:, 0] = qs
    vn_ref[:, 0] = vs
    lam_ref[:, 0] = lams


def substep_batched_pallas_multi(spec: SubstepSpec, n_sub: int, q, v,
                                 cmd, lam0, gcoef=None, wrench=None,
                                 mp=None, bufs=None, eps=None,
                                 interpret=None):
    """Batched ``n_sub``-substep advance in one kernel launch: q (B,nq),
    v (B,nv), cmd (B,nm) motor command / PD target (zero-order hold),
    lam0 (B,nc) [+ gcoef as in substep_batched_pallas: (B,4K) Fourier /
    (B,5) stairs] [+ wrench (B,6) root-body spatial wrench] [+ mp
    (B,n_mp) per-env model parameters when spec.randomized] [+ bufs
    (B,n_buf) flat sensor ring buffers and eps (B,n_upd·n_eps)
    pre-sampled corruption lanes when spec.sensors — the in-kernel
    sensor stage] → (q⁺, v⁺, λ, residual, f_contact (B,ncp,3) impulses,
    a (B,nv), τ (B,nv) [, bufs⁺]) — a/τ are the final substep's
    accepted acceleration and applied torque. Requires ``spec.torque``
    (the in-kernel actuation path)."""
    if spec.torque is None:
        raise ValueError("multi-substep kernel requires spec.torque")
    _check_kernel_inputs(spec, gcoef, wrench, mp)
    if (spec.sensors is not None) != (
        bufs is not None and eps is not None
    ):
        raise ValueError("bufs + eps required iff spec.sensors")
    n, nc, nq, ncp = spec.nv, spec.cfg.nc, spec.nq, spec.ncp
    nfc = max(3 * ncp, 1)
    B = q.shape[0]
    inputs = [(q, "repeat"), (v, "zero"), (cmd, "repeat"), (lam0, "zero")]
    if gcoef is not None:
        inputs.append((gcoef, "repeat"))
    if wrench is not None:
        inputs.append((wrench, "zero"))
    if mp is not None:
        inputs.append((mp, "repeat"))
    out_dims = (nq, n, nc, 1, nfc, n, n)
    if spec.sensors is not None:
        inputs.append((bufs, "repeat"))
        inputs.append((eps, "zero"))
        out_dims = out_dims + (spec.sensors.n_buf,)
    outs = _lane_kernel_call(
        spec, lambda *refs: _substep_multi_body(spec, n_sub, refs),
        inputs, out_dims, interpret,
    )
    qn, vn, lam, res, fc, acc, tau = outs[:7]
    f_contact = (
        fc.reshape(B, ncp, 3) if ncp
        else jnp.zeros((B, 0, 3), jnp.float32)
    )
    base = (qn, vn, lam, res[:, 0], f_contact, acc, tau)
    if spec.sensors is not None:
        return base + (outs[7],)
    return base
