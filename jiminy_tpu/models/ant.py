"""Ant — 8-DoF quadruped with splayed legs (classic RL benchmark).

Reference: jiminy's ant asset / ``AntJiminyEnv`` (SURVEY.md §2.5).
Built programmatically: torso (free) + 4 diagonal legs, each hip (z-axis)
+ knee (in-plane axis), contact point at each lower-leg tip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, TreeBuilder
from jiminy_tpu.hardware.motors import Motors
from jiminy_tpu.hardware.sensors import SensorSuite, encoder_spec, imu_spec
from jiminy_tpu.robot import Robot

_UPPER = 0.2
_LOWER = 0.4
_KNEE_DOWN = 0.9  # lower leg slopes down by this angle at stand


def make_ant(sensor_period: float = 0.005):
    """Returns (robot, stand_q)."""
    b = TreeBuilder()
    torso = b.add_body(
        "torso", -1, JointType.FREE, mass=1.5,
        inertia=np.diag([0.02, 0.02, 0.03]), joint_name="root_joint",
    )
    b.add_frame("torso_frame", torso)
    legs = {"fl": 45.0, "fr": -45.0, "bl": 135.0, "br": -135.0}
    motor_joints = []
    for name, deg in legs.items():
        a = np.deg2rad(deg)
        dir_xy = np.array([np.cos(a), np.sin(a), 0.0], np.float32)
        # hip: rotation about z at the torso rim
        hip = b.add_body(
            f"{name}_upper", torso, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(
                pos=0.12 * dir_xy, rpy=(0, 0, a)
            ),
            axis=(0, 0, 1), mass=0.2, com=(_UPPER / 2, 0, 0),
            inertia=np.diag([1e-4, 0.2 * _UPPER**2 / 12, 0.2 * _UPPER**2 / 12]),
            joint_name=f"{name}_hip", q_limits=(-0.6, 0.6),
            u_max=10.0, v_max=20.0, damping=0.05,
        )
        # knee: axis horizontal, perpendicular to the leg direction
        lower = b.add_body(
            f"{name}_lower", hip, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(_UPPER, 0, 0)),
            axis=(0, 1, 0), mass=0.2, com=(_LOWER / 2, 0, 0),
            inertia=np.diag([1e-4, 0.2 * _LOWER**2 / 12, 0.2 * _LOWER**2 / 12]),
            joint_name=f"{name}_knee", q_limits=(0.25, 1.4),
            u_max=10.0, v_max=20.0, damping=0.05,
        )
        b.add_contact_point(f"{name}_tip", lower, (_LOWER, 0, 0))
        motor_joints += [f"{name}_hip", f"{name}_knee"]
    tree = b.build()

    q = np.zeros(tree.nq, np.float32)
    q[6] = 1.0
    for name in legs:
        q[tree.q_off[tree.joint_index(f"{name}_knee")]] = _KNEE_DOWN
    xw, vel = algos.kinematics(tree, jnp.asarray(q), jnp.zeros(tree.nv))
    from jiminy_tpu.engine.contact import contact_points_world

    pts, _ = contact_points_world(tree, xw, vel)
    q[2] = -float(jnp.min(pts[:, 2])) + 0.002

    v_idx = [tree.v_off[tree.joint_index(j)] for j in motor_joints]
    q_idx = [tree.q_off[tree.joint_index(j)] for j in motor_joints]
    motors = Motors.create(
        v_idx, q_idx=q_idx, names=motor_joints, effort_limit=10.0,
        velocity_limit=20.0, friction_dry=0.05, friction_viscous=0.02,
    )
    sensors = SensorSuite.build(
        tree,
        [imu_spec("torso_frame")] + [encoder_spec(j) for j in motor_joints],
        sensor_period,
    )
    return Robot(tree, motors=motors, sensors=sensors, name="ant"), q
