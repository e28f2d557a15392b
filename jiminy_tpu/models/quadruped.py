"""ANYmal-class quadruped — the flagship benchmark model.

Reference: jiminy's ``data/quadrupedal_robots/anymal*`` assets (URDF +
hardware TOML) and the ``ANYmalJiminyEnv`` (SURVEY.md §1 "Assets", §2.5).
The BASELINE.json north star is ≥1M env-steps/s on this class of robot at
batch 4096 on one TPU host.

The robot is authored *as URDF text* (generated here, also checked into
``data/``) and built through the standard URDF + hardware-TOML pipeline,
so the model exercises exactly the code path an end user follows.

Morphology (ANYmal-B-like, 12 actuated DoF):
  base (floating) → per leg {LF, RF, LH, RH}:
    HAA (hip abduction, x-axis) → HFE (hip flexion, y) → KFE (knee, y)
  feet are fixed links fused into the shank, with contact points.
"""

from __future__ import annotations

import numpy as np

from jiminy_tpu.robot import Robot, build_robot

# leg name → (x sign, y sign)
_LEGS = {"LF": (1, 1), "RF": (1, -1), "LH": (-1, 1), "RH": (-1, -1)}

_BASE_MASS = 16.8
_HIP_MASS = 1.4
_THIGH_MASS = 1.1
_SHANK_MASS = 0.3
_FOOT_MASS = 0.1
_HIP_X, _HIP_Y = 0.277, 0.116  # HAA positions on the base
_HFE_OFF_X, _HFE_OFF_Y = 0.0635, 0.041  # HFE offset from HAA frame
_THIGH_LEN = 0.25
_SHANK_LEN = 0.33


def _box_inertia(m, x, y, z):
    return (
        m / 12.0 * (y * y + z * z),
        m / 12.0 * (x * x + z * z),
        m / 12.0 * (x * x + y * y),
    )


def anymal_urdf() -> str:
    """Generate the quadruped URDF document."""

    def link(name, mass, com, ixx, iyy, izz):
        return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{ixx}" ixy="0" ixz="0" iyy="{iyy}" iyz="0" izz="{izz}"/>
    </inertial>
  </link>"""

    def joint(name, jtype, parent, child, xyz, axis=None, lower=None,
              upper=None, effort=40.0, velocity=12.0, damping=0.0):
        ax = f'\n    <axis xyz="{axis}"/>' if axis else ""
        lim = ""
        if jtype == "revolute":
            lim = (
                f'\n    <limit lower="{lower}" upper="{upper}" '
                f'effort="{effort}" velocity="{velocity}"/>'
            )
        dyn = f'\n    <dynamics damping="{damping}"/>' if damping else ""
        return f"""  <joint name="{name}" type="{jtype}">
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="0 0 0"/>
    <parent link="{parent}"/>
    <child link="{child}"/>{ax}{lim}{dyn}
  </joint>"""

    bi = _box_inertia(_BASE_MASS, 0.53, 0.3, 0.24)
    parts = [
        "<robot name=\"anymal\">",
        link("base", _BASE_MASS, (0, 0, 0), *bi),
    ]
    for leg, (sx, sy) in _LEGS.items():
        hip = f"{leg}_HIP"
        thigh = f"{leg}_THIGH"
        shank = f"{leg}_SHANK"
        foot = f"{leg}_FOOT"
        hi = _box_inertia(_HIP_MASS, 0.1, 0.1, 0.1)
        ti = _box_inertia(_THIGH_MASS, 0.04, 0.04, _THIGH_LEN)
        si = _box_inertia(_SHANK_MASS, 0.03, 0.03, _SHANK_LEN)
        parts += [
            link(hip, _HIP_MASS, (0, sy * 0.02, 0), *hi),
            link(thigh, _THIGH_MASS, (0, 0, -_THIGH_LEN / 2), *ti),
            link(shank, _SHANK_MASS, (0, 0, -_SHANK_LEN / 2), *si),
            link(foot, _FOOT_MASS, (0, 0, 0), 1e-5, 1e-5, 1e-5),
            joint(
                f"{leg}_HAA", "revolute", "base", hip,
                (sx * _HIP_X, sy * _HIP_Y, 0.0), axis="1 0 0",
                lower=-0.72, upper=0.72,
            ),
            joint(
                f"{leg}_HFE", "revolute", hip, thigh,
                (sx * _HFE_OFF_X, sy * _HFE_OFF_Y, 0.0), axis="0 1 0",
                lower=-3.0, upper=3.0,
            ),
            joint(
                f"{leg}_KFE", "revolute", thigh, shank,
                (0.0, 0.0, -_THIGH_LEN), axis="0 1 0",
                lower=-3.0, upper=3.0,
            ),
            joint(
                f"{leg}_FOOT_JOINT", "fixed", shank, foot,
                (0.0, 0.0, -_SHANK_LEN),
            ),
        ]
    parts.append("</robot>")
    return "\n".join(parts)


def anymal_hardware(
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
) -> dict:
    """Hardware description (same schema as a ``*_hardware.toml``)."""
    motors, encoders, efforts = {}, {}, {}
    for leg in _LEGS:
        for j in ("HAA", "HFE", "KFE"):
            jn = f"{leg}_{j}"
            motors[jn] = {
                "joint_name": jn,
                "mechanicalReduction": 1.0,
                "armature": 0.07,
                "frictionDry": 0.2,
                "frictionViscous": 0.05,
                "effortLimit": 40.0,
                "velocityLimit": 12.0,
            }
            encoders[jn] = {
                "joint_name": jn,
                "delay": sensor_delay,
                "noiseStd": encoder_noise,
            }
            efforts[jn] = {"motor_name": jn}
    contacts = {
        f"{leg}_FOOT_SENSOR": {"frame_name": f"{leg}_FOOT"} for leg in _LEGS
    }
    return {
        "Global": {
            "contactFrameNames": [f"{leg}_FOOT" for leg in _LEGS],
        },
        "Motor": {"SimpleMotor": motors},
        "Sensor": {
            "ImuSensor": {
                "base_imu": {
                    "frame_name": "base_frame",
                    "delay": sensor_delay,
                    "noiseStd": imu_noise,
                }
            },
            "EncoderSensor": encoders,
            "EffortSensor": efforts,
            "ContactSensor": contacts,
        },
    }


# standing configuration: legs in X-shape, knees bent inward
_STAND_HFE = 0.4
_STAND_KFE = -0.8
STAND_HEIGHT = 0.57


def stand_q(tree) -> np.ndarray:
    """Nominal standing configuration (freeflyer + 12 joints)."""
    q = np.zeros(tree.nq, dtype=np.float32)
    q[2] = STAND_HEIGHT
    q[6] = 1.0  # identity quaternion (xyzw)
    for leg, (sx, _sy) in _LEGS.items():
        q[tree.q_off[tree.joint_index(f"{leg}_HFE")]] = sx * _STAND_HFE
        q[tree.q_off[tree.joint_index(f"{leg}_KFE")]] = sx * _STAND_KFE
    return q


def make_anymal(
    sensor_period: float = 0.0025,
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
) -> Robot:
    """Build the quadruped through the URDF + hardware pipeline."""
    return build_robot(
        anymal_urdf(),
        hardware=anymal_hardware(
            sensor_delay=sensor_delay,
            imu_noise=imu_noise,
            encoder_noise=encoder_noise,
        ),
        freeflyer=True,
        sensor_period=sensor_period,
        name="anymal",
    )
