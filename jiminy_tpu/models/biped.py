"""Cassie-class biped — closed kinematic loops + passive leg springs.

Reference: jiminy's ``data/bipedal_robots/cassie`` assets and
``CassieJiminyEnv``, whose defining features are the pushrod **closed
kinematic loops** (DistanceConstraint) and **passive shin springs**
(SURVEY.md §2.5, §7 hard-parts "Closed kinematic loops (Cassie)";
BASELINE.json config #4).

Morphology per leg (simplified Cassie): hip roll/yaw/pitch (motors) →
thigh → knee (motor) → shin upper → shin spring (PASSIVE 1-DoF spring) →
shin → tarsus (passive) → toe (motor) → foot (2 contact points).
A rigid pushrod (DistanceConstraint) ties the thigh to the tarsus, so
knee motion drives the tarsus through the loop, as on the real robot.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, TreeBuilder
from jiminy_tpu.engine.constraints import DistanceConstraint
from jiminy_tpu.hardware.motors import Motors
from jiminy_tpu.hardware.sensors import SensorSuite, encoder_spec, imu_spec
from jiminy_tpu.robot import Robot

# geometry
_HIP_Y = 0.13
_THIGH = 0.35
_SHIN_UP = 0.06
_SHIN = 0.30
_TARSUS = 0.35
_FOOT_HALF = 0.09
# nominal pose (pitch joints)
_STAND = {"hip_pitch": -0.25, "knee": 0.55, "shin_spring": 0.0,
          "tarsus": -0.35, "toe": 0.05}


def _pitch_chain_z(*segments):
    """(length, cumulative angle) pairs → (dx, dz) of the chain end."""
    x = z = 0.0
    for L, a in segments:
        x += L * np.sin(a)
        z -= L * np.cos(a)
    return x, z


def cassie_self_collision_pairs(radius: float = 0.04):
    """Declared self-collision pairs for the Cassie legs: left-vs-right
    thigh/shin/tarsus segment capsules (the segments that cross first
    when a gait collapses inward). Reference: jiminy activates
    self-collision pairs through hpp-fcl (SURVEY.md §2.1 "Model");
    here the static pair list feeds the PGS narrow phase
    (engine/collision.py), in-kernel on the whole-substep fast path."""
    from jiminy_tpu.engine.collision import Capsule, CollisionPair

    def seg(side, body, length):
        return Capsule(f"{side}_{body}", (0.0, 0.0, 0.0),
                       (0.0, 0.0, -length), radius)

    return tuple(
        CollisionPair(seg("L", body, length), seg("R", body, length))
        for body, length in
        (("thigh", _THIGH), ("shin", _SHIN), ("tarsus", _TARSUS))
    )


def make_cassie(
    sensor_period: float = 0.0025,
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
    flexibility: bool = False,
    flex_stiffness: float = 600.0,
    flex_damping: float = 5.0,
):
    """Build the biped. Returns (robot, constraints, stand_q) where
    ``constraints`` are the two pushrod DistanceConstraints (pass them to
    the Engine/WalkerEnv).

    ``flexibility=True`` inserts a 3-DoF quaternion flexibility joint
    upstream of each hip (the reference's signature real-robot modeling
    feature, SURVEY.md §2.1 "Model": flexible joints) and mounts one
    extra IMU on each hip body so a DeformationEstimator can reconstruct
    the deflection from the pelvis↔hip IMU pair (SURVEY.md §2.4
    "Blocks"). Spherical joints fall outside the whole-substep kernel;
    the engine auto-selects the solve-chain kernel instead."""
    b = TreeBuilder()
    pelvis = b.add_body(
        "pelvis", -1, JointType.FREE, mass=10.0,
        inertia=np.diag([0.1, 0.1, 0.1]), joint_name="root_joint",
    )
    b.add_frame("pelvis_frame", pelvis)

    rod_frames = {}
    for side, s in (("L", 1), ("R", -1)):
        hip_r = b.add_body(
            f"{side}_hip_roll", pelvis, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, s * _HIP_Y, -0.05)),
            axis=(1, 0, 0), mass=0.8, inertia=np.diag([2e-3] * 3),
            joint_name=f"{side}_hip_roll", q_limits=(-0.4, 0.4),
            u_max=80.0, v_max=12.0,
        )
        hip_y = b.add_body(
            f"{side}_hip_yaw", hip_r, JointType.REVOLUTE,
            axis=(0, 0, 1), mass=0.8, inertia=np.diag([2e-3] * 3),
            joint_name=f"{side}_hip_yaw", q_limits=(-0.4, 0.4),
            u_max=80.0, v_max=12.0,
        )
        thigh = b.add_body(
            f"{side}_thigh", hip_y, JointType.REVOLUTE,
            axis=(0, 1, 0), mass=3.0, com=(0, 0, -_THIGH / 2),
            inertia=np.diag([3.0 * _THIGH**2 / 12] * 2 + [1e-3]),
            joint_name=f"{side}_hip_pitch", q_limits=(-1.5, 1.2),
            u_max=120.0, v_max=12.0,
        )
        shin_up = b.add_body(
            f"{side}_shin_upper", thigh, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, 0, -_THIGH)),
            axis=(0, 1, 0), mass=0.6, com=(0, 0, -_SHIN_UP / 2),
            inertia=np.diag([2e-3] * 3),
            joint_name=f"{side}_knee", q_limits=(-0.3, 2.2),
            u_max=120.0, v_max=12.0,
        )
        shin = b.add_body(
            f"{side}_shin", shin_up, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, 0, -_SHIN_UP)),
            axis=(0, 1, 0), mass=0.6, com=(0, 0, -_SHIN / 2),
            inertia=np.diag([0.6 * _SHIN**2 / 12] * 2 + [5e-4]),
            joint_name=f"{side}_shin_spring", q_limits=(-0.35, 0.35),
            stiffness=1500.0, damping=3.0,
        )
        tarsus = b.add_body(
            f"{side}_tarsus", shin, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, 0, -_SHIN)),
            axis=(0, 1, 0), mass=0.8, com=(0, 0, -_TARSUS / 2),
            inertia=np.diag([0.8 * _TARSUS**2 / 12] * 2 + [5e-4]),
            joint_name=f"{side}_tarsus", q_limits=(-1.6, 0.3),
            damping=0.2,
        )
        foot = b.add_body(
            f"{side}_foot", tarsus, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, 0, -_TARSUS)),
            axis=(0, 1, 0), mass=0.3,
            inertia=np.diag([1e-3] * 3),
            joint_name=f"{side}_toe", q_limits=(-1.0, 1.0),
            u_max=40.0, v_max=12.0,
        )
        # pushrod attachment frames: thigh near the knee ↔ mid-tarsus
        f1 = b.add_frame(
            f"{side}_rod_thigh", thigh,
            TreeBuilder.make_placement(pos=(0.03, 0, -_THIGH + 0.05)),
        )
        f2 = b.add_frame(
            f"{side}_rod_tarsus", tarsus,
            TreeBuilder.make_placement(pos=(0.03, 0, -0.12)),
        )
        rod_frames[side] = (f1, f2)
        b.add_contact_point(f"{side}_toe_front", foot, (_FOOT_HALF, 0, -0.02))
        b.add_contact_point(f"{side}_toe_back", foot, (-_FOOT_HALF, 0, -0.02))
        if flexibility:
            # IMU ON the hip body (downstream of the future flexibility
            # joint) — pairs with the pelvis IMU across the deflection
            b.add_frame(f"{side}_hip_imu", hip_r)

    if flexibility:
        for side in ("L", "R"):
            b.insert_flexibility(
                f"{side}_hip_roll", stiffness=flex_stiffness,
                damping=flex_damping, inertia=1e-3,
            )

    tree = b.build()

    # nominal standing configuration (neutral_q: identity quats for the
    # free base AND any flexibility joints)
    q = np.asarray(tree.neutral_q(), np.float32).copy()
    for side in ("L", "R"):
        for jn, key in (
            (f"{side}_hip_pitch", "hip_pitch"),
            (f"{side}_knee", "knee"),
            (f"{side}_shin_spring", "shin_spring"),
            (f"{side}_tarsus", "tarsus"),
            (f"{side}_toe", "toe"),
        ):
            q[tree.q_off[tree.joint_index(jn)]] = _STAND[key]
    # set base height so toe contacts touch z=0
    xw, vel = algos.kinematics(tree, jnp.asarray(q), jnp.zeros(tree.nv))
    from jiminy_tpu.engine.contact import contact_points_world

    pts, _ = contact_points_world(tree, xw, vel)
    q[2] = -float(jnp.min(pts[:, 2])) + 0.002
    stand = q

    # pushrod lengths measured at the nominal pose (loop consistent there)
    xw, _ = algos.kinematics(tree, jnp.asarray(stand), jnp.zeros(tree.nv))
    constraints = []
    for side in ("L", "R"):
        f1, f2 = rod_frames[side]
        p1 = xw[tree.frame_body[f1]].compose(tree.frame_placement(f1)).pos
        p2 = xw[tree.frame_body[f2]].compose(tree.frame_placement(f2)).pos
        d = float(jnp.linalg.norm(p1 - p2))
        constraints.append(
            DistanceConstraint(
                frame1=f1, frame2=f2, distance=jnp.float32(d),
                baumgarte_freq=jnp.float32(20.0),
            )
        )

    motor_joints = []
    for side in ("L", "R"):
        motor_joints += [
            f"{side}_hip_roll", f"{side}_hip_yaw", f"{side}_hip_pitch",
            f"{side}_knee", f"{side}_toe",
        ]
    v_idx = [tree.v_off[tree.joint_index(j)] for j in motor_joints]
    q_idx = [tree.q_off[tree.joint_index(j)] for j in motor_joints]
    u_lim = [float(tree.u_max[i]) for i in v_idx]
    motors = Motors.create(
        v_idx, q_idx=q_idx, names=motor_joints,
        effort_limit=u_lim, velocity_limit=12.0,
        friction_dry=0.3, friction_viscous=0.1,
    )
    specs = [
        imu_spec("pelvis_frame", delay=sensor_delay, noise_std=imu_noise)
    ] + [
        encoder_spec(j, delay=sensor_delay, noise_std=encoder_noise)
        for j in motor_joints
    ]
    if flexibility:
        specs += [
            imu_spec(f"{side}_hip_imu", delay=sensor_delay,
                     noise_std=imu_noise)
            for side in ("L", "R")
        ]
    sensors = SensorSuite.build(tree, specs, sensor_period)
    robot = Robot(tree, motors=motors, sensors=sensors, name="cassie")
    return robot, tuple(constraints), stand
