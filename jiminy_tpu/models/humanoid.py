"""Atlas-class humanoid — bipedal locomotion benchmark model.

Reference: jiminy's ``data/bipedal_robots/atlas`` assets and
``AtlasJiminyEnv`` (SURVEY.md §1 "Assets", §2.5; BASELINE.json config #5:
humanoid locomotion + multi-host PPO).

Morphology (23 actuated DoF), authored as URDF and built through the
standard URDF + hardware pipeline:
  pelvis (floating) → torso (yaw/pitch/roll)
  per leg {L, R}: hip yaw/roll/pitch, knee, ankle pitch/roll  (6×2)
  per arm {L, R}: shoulder pitch/roll, elbow pitch, wrist yaw (4×2)
Feet are fixed links with 4 corner contact points each.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from jiminy_tpu.robot import Robot, build_robot


@dataclasses.dataclass(frozen=True)
class HumanoidParams:
    name: str = "atlas"
    pelvis_mass: float = 12.0
    torso_mass: float = 25.0
    hip_mass: float = 2.5
    thigh_mass: float = 5.0
    shank_mass: float = 3.0
    foot_mass: float = 1.5
    upper_arm_mass: float = 2.5
    lower_arm_mass: float = 1.5
    hip_y: float = 0.11
    thigh_len: float = 0.40
    shank_len: float = 0.40
    ankle_h: float = 0.08
    foot_len: float = 0.24
    foot_w: float = 0.12
    shoulder_y: float = 0.25
    torso_h: float = 0.45
    upper_arm_len: float = 0.30
    lower_arm_len: float = 0.30
    leg_effort: float = 250.0
    arm_effort: float = 90.0
    velocity: float = 12.0
    armature: float = 0.15


ATLAS = HumanoidParams()


def _box_i(m, x, y, z):
    return (
        m / 12 * (y * y + z * z),
        m / 12 * (x * x + z * z),
        m / 12 * (x * x + y * y),
    )


def humanoid_urdf(p: HumanoidParams = ATLAS) -> str:
    def link(name, mass, com, inertia):
        ixx, iyy, izz = inertia
        return (
            f'  <link name="{name}"><inertial>'
            f'<origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>'
            f'<mass value="{mass}"/>'
            f'<inertia ixx="{ixx}" ixy="0" ixz="0" iyy="{iyy}" iyz="0" '
            f'izz="{izz}"/></inertial></link>'
        )

    def joint(name, parent, child, xyz, axis, lo, hi, effort, jtype="revolute"):
        lim = (
            f'<limit lower="{lo}" upper="{hi}" effort="{effort}" '
            f'velocity="{p.velocity}"/>'
            if jtype == "revolute"
            else ""
        )
        ax = f'<axis xyz="{axis}"/>' if axis else ""
        return (
            f'  <joint name="{name}" type="{jtype}">'
            f'<origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="0 0 0"/>'
            f'<parent link="{parent}"/><child link="{child}"/>{ax}{lim}'
            f"</joint>"
        )

    L = [f'<robot name="{p.name}">']
    L.append(link("pelvis", p.pelvis_mass, (0, 0, 0),
                  _box_i(p.pelvis_mass, 0.25, 0.3, 0.2)))
    # torso chain (yaw → pitch → roll, masses on the last)
    L.append(link("torso_yaw_l", 0.5, (0, 0, 0), _box_i(0.5, 0.1, 0.1, 0.1)))
    L.append(link("torso_pitch_l", 0.5, (0, 0, 0), _box_i(0.5, 0.1, 0.1, 0.1)))
    L.append(link("torso", p.torso_mass, (0, 0, p.torso_h / 2),
                  _box_i(p.torso_mass, 0.3, 0.35, p.torso_h)))
    L.append(joint("back_bkz", "pelvis", "torso_yaw_l", (0, 0, 0.1),
                   "0 0 1", -0.7, 0.7, p.leg_effort))
    L.append(joint("back_bky", "torso_yaw_l", "torso_pitch_l", (0, 0, 0),
                   "0 1 0", -0.5, 0.6, p.leg_effort))
    L.append(joint("back_bkx", "torso_pitch_l", "torso", (0, 0, 0),
                   "1 0 0", -0.5, 0.5, p.leg_effort))

    for side, s in (("l", 1), ("r", -1)):
        # ---- leg ----
        hipy, hipr, thigh = f"{side}_hip_yaw_l", f"{side}_hip_roll_l", f"{side}_thigh"
        shank, anklep, foot = f"{side}_shank", f"{side}_ankle_l", f"{side}_foot"
        L.append(link(hipy, 0.8, (0, 0, 0), _box_i(0.8, 0.1, 0.1, 0.1)))
        L.append(link(hipr, p.hip_mass, (0, 0, 0), _box_i(p.hip_mass, 0.12, 0.12, 0.12)))
        L.append(link(thigh, p.thigh_mass, (0, 0, -p.thigh_len / 2),
                      _box_i(p.thigh_mass, 0.08, 0.08, p.thigh_len)))
        L.append(link(shank, p.shank_mass, (0, 0, -p.shank_len / 2),
                      _box_i(p.shank_mass, 0.06, 0.06, p.shank_len)))
        L.append(link(anklep, 0.3, (0, 0, 0), _box_i(0.3, 0.05, 0.05, 0.05)))
        L.append(link(foot, p.foot_mass, (0.03, 0, -p.ankle_h / 2),
                      _box_i(p.foot_mass, p.foot_len, p.foot_w, p.ankle_h)))
        L.append(joint(f"{side}_leg_hpz", "pelvis", hipy, (0, s * p.hip_y, -0.1),
                       "0 0 1", -0.8, 0.8, p.leg_effort))
        L.append(joint(f"{side}_leg_hpx", hipy, hipr, (0, 0, 0),
                       "1 0 0", -0.6, 0.6, p.leg_effort))
        L.append(joint(f"{side}_leg_hpy", hipr, thigh, (0, 0, 0),
                       "0 1 0", -1.8, 0.6, p.leg_effort))
        L.append(joint(f"{side}_leg_kny", thigh, shank, (0, 0, -p.thigh_len),
                       "0 1 0", 0.0, 2.4, p.leg_effort))
        L.append(joint(f"{side}_leg_aky", shank, anklep, (0, 0, -p.shank_len),
                       "0 1 0", -1.0, 0.8, p.leg_effort))
        L.append(joint(f"{side}_leg_akx", anklep, foot, (0, 0, 0),
                       "1 0 0", -0.6, 0.6, p.leg_effort))
        # ---- arm ----
        shp, shr = f"{side}_shoulder_p_l", f"{side}_upper_arm"
        elb, wrist = f"{side}_lower_arm", f"{side}_hand"
        L.append(link(shp, 0.5, (0, 0, 0), _box_i(0.5, 0.08, 0.08, 0.08)))
        L.append(link(shr, p.upper_arm_mass, (0, 0, -p.upper_arm_len / 2),
                      _box_i(p.upper_arm_mass, 0.06, 0.06, p.upper_arm_len)))
        L.append(link(elb, p.lower_arm_mass, (0, 0, -p.lower_arm_len / 2),
                      _box_i(p.lower_arm_mass, 0.05, 0.05, p.lower_arm_len)))
        L.append(link(wrist, 0.5, (0, 0, 0), _box_i(0.5, 0.06, 0.06, 0.06)))
        L.append(joint(f"{side}_arm_shy", "torso", shp,
                       (0, s * p.shoulder_y, p.torso_h - 0.05),
                       "0 1 0", -2.0, 2.0, p.arm_effort))
        L.append(joint(f"{side}_arm_shx", shp, shr, (0, 0, 0),
                       "1 0 0", -1.6, 1.6, p.arm_effort))
        L.append(joint(f"{side}_arm_ely", shr, elb, (0, 0, -p.upper_arm_len),
                       "0 1 0", -2.4, 0.0, p.arm_effort))
        L.append(joint(f"{side}_arm_wrz", elb, wrist, (0, 0, -p.lower_arm_len),
                       "0 0 1", -1.6, 1.6, p.arm_effort, jtype="revolute"))
    L.append("</robot>")
    return "\n".join(L)


def humanoid_hardware(
    p: HumanoidParams = ATLAS,
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
    flexibility: bool = False,
) -> dict:
    """Motors + encoders/effort sensors on every joint, IMU on the pelvis,
    foot contact points at the sole corners."""
    joints = ["back_bkz", "back_bky", "back_bkx"]
    for side in ("l", "r"):
        joints += [f"{side}_leg_{j}" for j in ("hpz", "hpx", "hpy", "kny", "aky", "akx")]
        joints += [f"{side}_arm_{j}" for j in ("shy", "shx", "ely", "wrz")]
    motors = {
        j: {
            "joint_name": j,
            "armature": p.armature,
            "frictionDry": 0.5,
            "frictionViscous": 0.1,
            "effortLimit": p.leg_effort if "_leg_" in j or "back" in j else p.arm_effort,
            "velocityLimit": p.velocity,
        }
        for j in joints
    }
    encoders = {
        j: {"joint_name": j, "delay": sensor_delay,
            "noiseStd": encoder_noise}
        for j in joints
    }
    efforts = {j: {"motor_name": j} for j in joints}
    # foot sole corner contact points, offset from the foot links
    contacts = {}
    for side in ("l", "r"):
        corners = [
            (cx, cy)
            for cx in (-p.foot_len / 2 + 0.03, p.foot_len / 2 + 0.03)
            for cy in (-p.foot_w / 2, p.foot_w / 2)
        ]
        for i, (cx, cy) in enumerate(corners):
            contacts[f"{side}_foot_corner{i}"] = {
                "frame_name": f"{side}_foot",
                "pos": [cx, cy, -p.ankle_h],
            }
    hw_flex = {}
    if flexibility:
        # 3-DoF quaternion flexibility at the torso joint — the
        # reference's flexible-joint hardware declaration (SURVEY.md
        # §2.1 "Model"; hardware-TOML [Flexibility] sections)
        hw_flex = {
            "Flexibility": {
                "torso_flex": {
                    "joint_name": "back_bkz",
                    "stiffness": 8000.0,
                    "damping": 40.0,
                    "inertia": 1e-3,
                }
            }
        }
    return {
        **hw_flex,
        "Global": {"contactFrameNames": [], "contactPoints": contacts},
        "Motor": {"SimpleMotor": motors},
        "Sensor": {
            "ImuSensor": {
                "pelvis_imu": {
                    "frame_name": "pelvis_frame",
                    "delay": sensor_delay,
                    "noiseStd": imu_noise,
                }
            },
            "EncoderSensor": encoders,
            "EffortSensor": efforts,
        },
    }


def atlas_self_collision_pairs(p: HumanoidParams = ATLAS,
                               leg_radius: float = 0.06,
                               arm_radius: float = 0.05):
    """Declared self-collision pairs for the humanoid: L-vs-R thigh and
    shank capsules (the crossing legs of a collapsing gait) plus each
    lower arm's capsule against the TORSO BOX (exact SDF contacts — the
    arms swing through the torso volume otherwise). Reference: jiminy
    activates humanoid self-collision through hpp-fcl (SURVEY.md §2.1
    "Model"). 12 total contacts — inside the whole-substep kernel's
    in-kernel pair scope."""
    from jiminy_tpu.engine.collision import Box, Capsule, CollisionPair

    def leg_seg(side, link, length):
        return Capsule(
            f"{side}_{link}", (0.0, 0.0, 0.0), (0.0, 0.0, -length),
            leg_radius,
        )

    torso = Box(
        "torso", (0.0, 0.0, p.torso_h / 2),
        (0.16, 0.18, p.torso_h / 2),
    )
    pairs = [
        CollisionPair(leg_seg("l", "thigh", p.thigh_len),
                      leg_seg("r", "thigh", p.thigh_len)),
        CollisionPair(leg_seg("l", "shank", p.shank_len),
                      leg_seg("r", "shank", p.shank_len)),
    ]
    for side in ("l", "r"):
        pairs.append(
            CollisionPair(
                Capsule(
                    f"{side}_lower_arm", (0.0, 0.0, 0.0),
                    (0.0, 0.0, -p.lower_arm_len), arm_radius,
                ),
                torso,
            )
        )
    return tuple(pairs)


def make_atlas(
    sensor_period: float = 0.0025,
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
) -> Robot:
    """Build the humanoid through the URDF + hardware pipeline."""
    return build_robot(
        humanoid_urdf(ATLAS),
        hardware=humanoid_hardware(
            ATLAS, sensor_delay=sensor_delay, imu_noise=imu_noise,
            encoder_noise=encoder_noise,
        ),
        freeflyer=True,
        sensor_period=sensor_period,
        name=ATLAS.name,
    )


def atlas_stand_q(tree) -> np.ndarray:
    """Stand with slightly bent knees and matching hip/ankle pitch."""
    p = ATLAS
    knee = 0.35
    hip = -knee / 2
    ankle = -knee / 2
    q = np.zeros(tree.nq, np.float32)
    q[6] = 1.0
    height = (
        0.1  # pelvis → hip
        + p.thigh_len * np.cos(hip)
        + p.shank_len * np.cos(hip + knee)
        + p.ankle_h
    )
    q[2] = height + 0.005
    for side in ("l", "r"):
        q[tree.q_off[tree.joint_index(f"{side}_leg_hpy")]] = hip
        q[tree.q_off[tree.joint_index(f"{side}_leg_kny")]] = knee
        q[tree.q_off[tree.joint_index(f"{side}_leg_aky")]] = ankle
        q[tree.q_off[tree.joint_index(f"{side}_arm_shx")]] = (
            -0.2 if side == "l" else 0.2
        )
        q[tree.q_off[tree.joint_index(f"{side}_arm_ely")]] = -0.5
    return q
