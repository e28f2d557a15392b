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

import dataclasses

import numpy as np

from jiminy_tpu.robot import Robot, build_robot

# leg name → (x sign, y sign)
_LEGS = {"LF": (1, 1), "RF": (1, -1), "LH": (-1, 1), "RH": (-1, -1)}


@dataclasses.dataclass(frozen=True)
class QuadrupedParams:
    """Morphology parameters; the generator serves any quadruped of this
    family (ANYmal, Spotmicro — reference assets, SURVEY.md §1)."""

    name: str = "anymal"
    base_mass: float = 16.8
    base_dims: tuple = (0.53, 0.3, 0.24)
    hip_mass: float = 1.4
    thigh_mass: float = 1.1
    shank_mass: float = 0.3
    foot_mass: float = 0.1
    hip_x: float = 0.277
    hip_y: float = 0.116
    hfe_off_x: float = 0.0635
    hfe_off_y: float = 0.041
    thigh_len: float = 0.25
    shank_len: float = 0.33
    effort: float = 40.0
    velocity: float = 12.0
    armature: float = 0.07
    friction_dry: float = 0.2
    friction_viscous: float = 0.05
    stand_hfe: float = 0.4
    stand_kfe: float = -0.8
    # collision-capsule feet (reference: collision bodies via hpp-fcl,
    # SURVEY.md §2.1 "Model"). 0 = bare contact points (the default,
    # fastest path); > 0 emits a <collision> capsule on each foot link
    # (axis along y, length foot_len) and the hardware opts the feet in
    # via collisionBodyNames, so each foot contacts the ground at the
    # capsule SURFACE (two end spheres, center − r·n̂) and can rock/roll.
    foot_radius: float = 0.0
    foot_len: float = 0.0


ANYMAL = QuadrupedParams()
SPOTMICRO = QuadrupedParams(
    name="spotmicro",
    base_mass=1.2,
    base_dims=(0.25, 0.11, 0.07),
    hip_mass=0.12,
    thigh_mass=0.09,
    shank_mass=0.04,
    foot_mass=0.01,
    hip_x=0.093,
    hip_y=0.039,
    hfe_off_x=0.0,
    hfe_off_y=0.028,
    thigh_len=0.11,
    shank_len=0.13,
    effort=2.0,
    velocity=8.0,
    armature=0.002,
    friction_dry=0.02,
    friction_viscous=0.005,
)

_BASE_MASS = ANYMAL.base_mass
_HIP_X, _HIP_Y = ANYMAL.hip_x, ANYMAL.hip_y
_THIGH_LEN = ANYMAL.thigh_len
_SHANK_LEN = ANYMAL.shank_len


def _box_inertia(m, x, y, z):
    return (
        m / 12.0 * (y * y + z * z),
        m / 12.0 * (x * x + z * z),
        m / 12.0 * (x * x + y * y),
    )


def quadruped_urdf(p: QuadrupedParams) -> str:
    """Generate a quadruped URDF document from morphology parameters."""

    def link(name, mass, com, ixx, iyy, izz, extra=""):
        return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{ixx}" ixy="0" ixz="0" iyy="{iyy}" iyz="0" izz="{izz}"/>
    </inertial>{extra}
  </link>"""

    # capsule feet: <collision> capsule, axis along y (rpy rotates the
    # capsule's local z onto y), opted in via collisionBodyNames in the
    # hardware description (see QuadrupedParams.foot_radius)
    foot_extra = ""
    if p.foot_radius > 0:
        foot_extra = f"""
    <collision>
      <origin xyz="0 0 0" rpy="1.5707963267948966 0 0"/>
      <geometry><capsule radius="{p.foot_radius}" length="{p.foot_len}"/></geometry>
    </collision>"""

    def joint(name, jtype, parent, child, xyz, axis=None, lower=None,
              upper=None, effort=p.effort, velocity=p.velocity, damping=0.0):
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

    bi = _box_inertia(p.base_mass, *p.base_dims)
    parts = [
        f'<robot name="{p.name}">',
        link("base", p.base_mass, (0, 0, 0), *bi),
    ]
    hip_w = p.base_dims[1] / 3.0
    for leg, (sx, sy) in _LEGS.items():
        hip = f"{leg}_HIP"
        thigh = f"{leg}_THIGH"
        shank = f"{leg}_SHANK"
        foot = f"{leg}_FOOT"
        hi = _box_inertia(p.hip_mass, hip_w, hip_w, hip_w)
        ti = _box_inertia(p.thigh_mass, 0.04, 0.04, p.thigh_len)
        si = _box_inertia(p.shank_mass, 0.03, 0.03, p.shank_len)
        parts += [
            link(hip, p.hip_mass, (0, sy * 0.02, 0), *hi),
            link(thigh, p.thigh_mass, (0, 0, -p.thigh_len / 2), *ti),
            link(shank, p.shank_mass, (0, 0, -p.shank_len / 2), *si),
            link(foot, p.foot_mass, (0, 0, 0), 1e-5, 1e-5, 1e-5,
                 extra=foot_extra),
            joint(
                f"{leg}_HAA", "revolute", "base", hip,
                (sx * p.hip_x, sy * p.hip_y, 0.0), axis="1 0 0",
                lower=-0.72, upper=0.72,
            ),
            joint(
                f"{leg}_HFE", "revolute", hip, thigh,
                (sx * p.hfe_off_x, sy * p.hfe_off_y, 0.0), axis="0 1 0",
                lower=-3.0, upper=3.0,
            ),
            joint(
                f"{leg}_KFE", "revolute", thigh, shank,
                (0.0, 0.0, -p.thigh_len), axis="0 1 0",
                lower=-3.0, upper=3.0,
            ),
            joint(
                f"{leg}_FOOT_JOINT", "fixed", shank, foot,
                (0.0, 0.0, -p.shank_len),
            ),
        ]
    parts.append("</robot>")
    return "\n".join(parts)


def anymal_urdf() -> str:
    """The ANYmal-class instance of the quadruped family."""
    return quadruped_urdf(ANYMAL)


def quadruped_hardware(
    p: QuadrupedParams,
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
                "armature": p.armature,
                "frictionDry": p.friction_dry,
                "frictionViscous": p.friction_viscous,
                "effortLimit": p.effort,
                "velocityLimit": p.velocity,
            }
            encoders[jn] = {
                "joint_name": jn,
                "delay": sensor_delay,
                "noiseStd": encoder_noise,
            }
            efforts[jn] = {"motor_name": jn}
    if p.foot_radius > 0:
        # capsule feet: contacts come from the URDF <collision> capsules
        # (two surface-point end spheres per foot); each contact sensor
        # reads one end-sphere site
        global_cfg = {
            "collisionBodyNames": [f"{leg}_FOOT" for leg in _LEGS],
        }
        contacts = {
            f"{leg}_FOOT_SENSOR": {"frame_name": f"{leg}_FOOT_col0_a"}
            for leg in _LEGS
        }
    else:
        global_cfg = {
            "contactFrameNames": [f"{leg}_FOOT" for leg in _LEGS],
        }
        contacts = {
            f"{leg}_FOOT_SENSOR": {"frame_name": f"{leg}_FOOT"}
            for leg in _LEGS
        }
    return {
        "Global": global_cfg,
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


def anymal_hardware(
    sensor_delay: float = 0.0, imu_noise: float = 0.0, encoder_noise: float = 0.0
) -> dict:
    return quadruped_hardware(
        ANYMAL, sensor_delay=sensor_delay, imu_noise=imu_noise,
        encoder_noise=encoder_noise,
    )


# standing configuration: legs in X-shape, knees bent inward
_STAND_HFE = 0.4
_STAND_KFE = -0.8
STAND_HEIGHT = 0.57


def stand_q(tree, params: QuadrupedParams = ANYMAL) -> np.ndarray:
    """Nominal standing configuration (freeflyer + 12 joints)."""
    q = np.zeros(tree.nq, dtype=np.float32)
    hfe, kfe = params.stand_hfe, params.stand_kfe
    # stand height: hip height with both segments bent
    q[2] = (
        params.thigh_len * np.cos(hfe)
        + params.shank_len * np.cos(hfe + kfe)
        + params.foot_radius  # capsule feet ride on the surface point
        + 0.01
    )
    q[6] = 1.0  # identity quaternion (xyzw)
    for leg, (sx, _sy) in _LEGS.items():
        q[tree.q_off[tree.joint_index(f"{leg}_HFE")]] = sx * hfe
        q[tree.q_off[tree.joint_index(f"{leg}_KFE")]] = sx * kfe
    return q


def make_quadruped(
    params: QuadrupedParams,
    sensor_period: float = 0.0025,
    sensor_delay: float = 0.0,
    imu_noise: float = 0.0,
    encoder_noise: float = 0.0,
) -> Robot:
    """Build a quadruped of this family through the URDF + hardware
    pipeline."""
    return build_robot(
        quadruped_urdf(params),
        hardware=quadruped_hardware(
            params,
            sensor_delay=sensor_delay,
            imu_noise=imu_noise,
            encoder_noise=encoder_noise,
        ),
        freeflyer=True,
        sensor_period=sensor_period,
        name=params.name,
    )


def make_anymal(**kwargs) -> Robot:
    """Build the ANYmal-class flagship quadruped."""
    return make_quadruped(ANYMAL, **kwargs)


def make_spotmicro(**kwargs) -> Robot:
    """Build the Spotmicro-class small quadruped (reference env
    SpotmicroJiminyEnv, SURVEY.md §2.5)."""
    return make_quadruped(SPOTMICRO, **kwargs)
