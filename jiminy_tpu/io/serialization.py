"""Robot/model serialization — embed the full robot in log headers.

Reference: jiminy serializes the robot (boost::serialization + JSON) into
telemetry log constants so a log alone reconstructs the exact setup
(``build_robot_from_log`` — SURVEY.md §2.1 "io", §2.3 "Log tooling").
Here the model is plain data (a KinematicTree pytree + hardware specs),
so serialization is JSON of the arrays + static metadata.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core.tree import JointType, KinematicTree
from jiminy_tpu.hardware.motors import Motors
from jiminy_tpu.hardware.sensors import SensorGroup, SensorSuite
from jiminy_tpu.robot import Robot

_TREE_STATIC = (
    "nb", "nq", "nv", "parent", "joint_type", "q_off", "v_off",
    "body_name", "joint_name", "frame_body", "frame_name",
    "contact_body", "contact_frame_name",
)
_TREE_ARRAYS = (
    "jp_rot", "jp_pos", "axis", "inertia_mass", "inertia_h", "inertia_mat",
    "armature", "damping", "stiffness", "q_min", "q_max", "v_max", "u_max",
    "gravity", "fp_rot", "fp_pos", "contact_pos", "contact_radius",
)


def tree_to_dict(tree: KinematicTree) -> dict:
    d = {}
    for k in _TREE_STATIC:
        v = getattr(tree, k)
        if k == "joint_type":
            v = [int(t) for t in v]
        d[k] = list(v) if isinstance(v, tuple) else v
    for k in _TREE_ARRAYS:
        d[k] = np.asarray(getattr(tree, k)).tolist()
    return d


def tree_from_dict(d: dict) -> KinematicTree:
    kwargs = {}
    for k in _TREE_STATIC:
        v = d[k]
        if k == "joint_type":
            v = tuple(JointType(t) for t in v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    for k in _TREE_ARRAYS:
        if k == "contact_radius" and k not in d:
            # logs written before collision spheres existed: bare points
            kwargs[k] = jnp.zeros(len(d["contact_body"]), jnp.float32)
            continue
        kwargs[k] = jnp.asarray(np.asarray(d[k], np.float32))
    return KinematicTree(**kwargs)


def motors_to_dict(m: Motors) -> dict:
    return {
        "v_idx": list(m.v_idx),
        "q_idx": list(m.q_idx),
        "name": list(m.name),
        **{
            k: np.asarray(getattr(m, k)).tolist()
            for k in (
                "reduction", "effort_limit", "velocity_limit",
                "friction_dry", "friction_viscous", "friction_vel_eps",
            )
        },
    }


def motors_from_dict(d: dict) -> Motors:
    return Motors(
        v_idx=tuple(d["v_idx"]),
        q_idx=tuple(d["q_idx"]),
        name=tuple(d["name"]),
        **{
            k: jnp.asarray(np.asarray(d[k], np.float32))
            for k in (
                "reduction", "effort_limit", "velocity_limit",
                "friction_dry", "friction_viscous", "friction_vel_eps",
            )
        },
    )


def sensors_to_dict(s: SensorSuite) -> dict:
    return {
        "period": s.period,
        "groups": [
            {
                "type": g.type,
                "target": list(g.target),
                "name": list(g.name),
                "buf_len": g.buf_len,
                "delay": np.asarray(g.delay).tolist(),
                "bias": np.asarray(g.bias).tolist(),
                "noise_std": np.asarray(g.noise_std).tolist(),
            }
            for g in s.groups
        ],
    }


def sensors_from_dict(d: dict, tree: KinematicTree) -> SensorSuite:
    groups = [
        SensorGroup(
            type=g["type"],
            target=tuple(g["target"]),
            name=tuple(g["name"]),
            buf_len=g["buf_len"],
            delay=jnp.asarray(np.asarray(g["delay"], np.float32)),
            bias=jnp.asarray(np.asarray(g["bias"], np.float32)),
            noise_std=jnp.asarray(np.asarray(g["noise_std"], np.float32)),
        )
        for g in d["groups"]
    ]
    return SensorSuite(tree, groups, d["period"])


def robot_to_json(robot: Robot) -> str:
    d = {"name": robot.name, "tree": tree_to_dict(robot.tree)}
    if robot.motors is not None:
        d["motors"] = motors_to_dict(robot.motors)
    if robot.sensors is not None:
        d["sensors"] = sensors_to_dict(robot.sensors)
    return json.dumps(d)


def robot_from_json(s: str) -> Robot:
    d = json.loads(s)
    tree = tree_from_dict(d["tree"])
    motors = motors_from_dict(d["motors"]) if "motors" in d else None
    sensors = (
        sensors_from_dict(d["sensors"], tree) if "sensors" in d else None
    )
    return Robot(tree, motors=motors, sensors=sensors, name=d["name"])


def build_robot_from_log(log) -> Robot:
    """Reconstruct the exact robot from a telemetry log's constants
    (reference: jiminy_py.log.build_robot_from_log)."""
    if "robot" not in log.constants:
        raise KeyError("log has no embedded robot serialization")
    return robot_from_json(log.constants["robot"])
