"""Robot = model + hardware, auto-built from URDF + hardware TOML.

Reference: jiminy_py's ``BaseJiminyRobot`` parses a ``*_hardware.toml``
next to the URDF and attaches motors / sensors / contact frames
accordingly, with a generator for a sensible default hardware description
(SURVEY.md §2.3 "Robot auto-build"). The TOML schema mirrors the
reference's section names:

    [Global]
    contactFrameNames = ["LF_FOOT", ...]

    [Motor.SimpleMotor.<name>]
    joint_name = "..."   # required
    mechanicalReduction = 1.0
    armature = 0.0
    frictionDry = 0.0
    frictionViscous = 0.0

    [Sensor.ImuSensor.<name>]      frame_name = "..."
    [Sensor.EncoderSensor.<name>]  joint_name = "..."
    [Sensor.EffortSensor.<name>]   motor_name = "..."
    [Sensor.ContactSensor.<name>]  frame_name = "..."   # a contact frame
    [Sensor.ForceSensor.<name>]    frame_name = "..."

    (each sensor section also accepts delay / bias / noiseStd)
"""

from __future__ import annotations

import tomllib
from pathlib import Path

import numpy as np

from jiminy_tpu.core.tree import JOINT_NV, JointType, KinematicTree
from jiminy_tpu.hardware.motors import Motors
from jiminy_tpu.hardware.sensors import SensorSuite
from jiminy_tpu.io.urdf import parse_urdf


class Robot:
    """A built robot: kinematic tree + motor bank + sensor suite.

    The reference's ``Robot`` (C++) aggregates Model + hardware and
    exposes sensor measurements (SURVEY.md §2.1 "Robot")."""

    def __init__(
        self,
        tree: KinematicTree,
        motors: Motors | None = None,
        sensors: SensorSuite | None = None,
        name: str = "robot",
        visuals: dict | None = None,
        collision_shapes: dict | None = None,
    ):
        self.tree = tree
        self.motors = motors
        self.sensors = sensors
        self.name = name
        # display geometry for the 3-D viewer: {body_idx: [geom dicts]}
        # from URDF <visual>/<collision> (io/urdf.py); None → the viewer
        # auto-generates skeleton capsules
        self.visuals = visuals
        # parsed <collision> geometry per link: {link: (body_idx, [geom
        # tuples])} — ("sphere", c, r) / ("capsule", p0, p1, r) /
        # ("box", corners) / ("mesh", support_pts, (p0, p1, r)).
        # Pair-collision specs resolve through this (engine/collision.py
        # shape_for_link); reference: the hpp-fcl geometry model
        self.collision_shapes = collision_shapes or {}

    @property
    def nmotors(self) -> int:
        return self.motors.nm if self.motors is not None else 0


def default_hardware(builder, info) -> dict:
    """Heuristic default hardware description: a motor + encoder + effort
    sensor on every actuated 1-DoF joint, an IMU on the root body
    (reference: ``generate_default_hardware_description_file``)."""
    hw: dict = {"Global": {"contactFrameNames": []},
                "Motor": {"SimpleMotor": {}}, "Sensor": {}}
    enc, eff = {}, {}
    for jname, jtype in zip(builder.joint_name, builder.joint_type):
        if jtype in (JointType.REVOLUTE, JointType.PRISMATIC):
            hw["Motor"]["SimpleMotor"][jname] = {"joint_name": jname}
            enc[jname] = {"joint_name": jname}
            eff[jname] = {"motor_name": jname}
    hw["Sensor"]["EncoderSensor"] = enc
    hw["Sensor"]["EffortSensor"] = eff
    root = builder.body_name[0] if builder.body_name else None
    if root is not None:
        hw["Sensor"]["ImuSensor"] = {
            root + "_imu": {"frame_name": root + "_frame"}
        }
    return hw


def build_robot(
    urdf: str | Path,
    hardware: str | Path | dict | None = None,
    freeflyer: bool = False,
    sensor_period: float = 0.01,
    gravity=(0.0, 0.0, -9.81),
    name: str = "robot",
) -> Robot:
    """Parse URDF (+ hardware TOML) and assemble a Robot.

    ``hardware`` may be a TOML path, a pre-parsed dict, or None (defaults
    generated). Armature from motor sections is folded into the tree's
    mass-matrix diagonal before build (reference: motor rotor inertia via
    the pinocchio overloads, SURVEY.md §2.1)."""
    builder, info = parse_urdf(urdf, freeflyer=freeflyer, gravity=gravity)

    if hardware is None:
        hw = default_hardware(builder, info)
    elif isinstance(hardware, dict):
        hw = hardware
    else:
        hw = tomllib.loads(Path(hardware).read_text())

    # ---- flexible joints (inserted before anything indexes bodies) -------
    # Reference: the hardware file lists flexibility frames with
    # stiffness/damping/inertia (SURVEY.md §2.1 "Model": flexible joints)
    for fname, cfg in hw.get("Flexibility", {}).items():
        i = builder.insert_flexibility(
            cfg.get("joint_name", fname),
            stiffness=cfg.get("stiffness", 100.0),
            damping=cfg.get("damping", 1.0),
            inertia=cfg.get("inertia", 1e-3),
        )
        # body indices in the URDF link map shift past the insertion
        # point — and so do the <collision>/<visual> geometry maps
        info = {
            k: (kind, idx + 1 if kind == "body" and idx >= i else idx)
            for k, (kind, idx) in info.items()
        }
        builder.urdf_collisions = {
            k: (b + 1 if b >= i else b, g)
            for k, (b, g) in getattr(builder, "urdf_collisions", {}).items()
        }
        builder.urdf_visuals = {
            (b + 1 if b >= i else b): g
            for b, g in getattr(builder, "urdf_visuals", {}).items()
        }

    # ---- 1-DoF joint springs (e.g. Cassie shin springs) -------------------
    # [JointSpring.<name>] joint_name, stiffness, damping
    for sname, cfg in hw.get("JointSpring", {}).items():
        jidx = builder.joint_name.index(cfg.get("joint_name", sname))
        builder.stiffness[jidx][:] = float(cfg.get("stiffness", 0.0))
        builder.damping[jidx][:] = np.maximum(
            builder.damping[jidx], float(cfg.get("damping", 0.0))
        )

    # ---- contact frames → contact points on carrier bodies ---------------
    for cname in hw.get("Global", {}).get("contactFrameNames", []):
        kind, idx = _resolve(info, builder, cname)
        if kind == "frame":
            body = builder.frame_body[idx]
            pos = builder.fp[idx][:3, 3]
        else:
            body, pos = idx, np.zeros(3, np.float32)
        if body < 0:
            raise ValueError(f"contact frame {cname!r} attached to the world")
        builder.add_contact_point(cname, body, pos)

    # ---- collision bodies: URDF <collision> primitives vs ground ------
    # [Global] collisionBodyNames = ["LF_FOOT", ...] — attaches the
    # parsed sphere/capsule/box footprints of those links as contact
    # sites (spheres keep their radius: surface-point contact, rolling
    # Jacobians; reference: collision bodies via hpp-fcl, SURVEY.md §2.1)
    for lname in hw.get("Global", {}).get("collisionBodyNames", []):
        if lname not in getattr(builder, "urdf_collisions", {}):
            raise ValueError(
                f"collision body {lname!r}: no <collision> geometry in "
                "the URDF for that link"
            )
        body, geoms = builder.urdf_collisions[lname]
        if body < 0:
            raise ValueError(f"collision body {lname!r} fixed to the world")
        for gi, g in enumerate(geoms):
            base = f"{lname}_col{gi}"
            if g[0] == "sphere":
                builder.add_contact_sphere(base, body, g[1], radius=g[2])
            elif g[0] == "capsule":
                builder.add_contact_capsule(base, body, g[1], g[2], g[3])
            elif g[0] == "mesh":  # convex support points of the STL
                for ci, c in enumerate(g[1]):
                    builder.add_contact_point(f"{base}_v{ci}", body, c)
            else:  # box: corner points
                for ci, c in enumerate(g[1]):
                    builder.add_contact_point(f"{base}_c{ci}", body, c)

    # explicit contact spheres/capsules with offsets from a link/frame:
    # [Global] contactSpheres = {name: {frame_name, center, radius}}
    # [Global] contactCapsules = {name: {frame_name, p0, p1, radius}}
    for cname, cfg in hw.get("Global", {}).get("contactSpheres", {}).items():
        kind, idx = _resolve(info, builder, cfg["frame_name"])
        off = np.asarray(cfg.get("center", (0.0, 0.0, 0.0)), np.float32)
        if kind == "frame":
            body = builder.frame_body[idx]
            T = builder.fp[idx]
            off = T[:3, :3] @ off + T[:3, 3]
        else:
            body = idx
        builder.add_contact_sphere(
            cname, body, off, radius=float(cfg["radius"])
        )
    for cname, cfg in hw.get("Global", {}).get("contactCapsules", {}).items():
        kind, idx = _resolve(info, builder, cfg["frame_name"])
        p0 = np.asarray(cfg["p0"], np.float32)
        p1 = np.asarray(cfg["p1"], np.float32)
        if kind == "frame":
            body = builder.frame_body[idx]
            T = builder.fp[idx]
            p0 = T[:3, :3] @ p0 + T[:3, 3]
            p1 = T[:3, :3] @ p1 + T[:3, 3]
        else:
            body = idx
        builder.add_contact_capsule(
            cname, body, p0, p1, float(cfg["radius"])
        )

    # explicit contact points with offsets from a link/frame:
    # [Global] contactPoints = {name: {frame_name, pos = [x, y, z]}}
    for cname, cfg in hw.get("Global", {}).get("contactPoints", {}).items():
        kind, idx = _resolve(info, builder, cfg["frame_name"])
        off = np.asarray(cfg.get("pos", (0.0, 0.0, 0.0)), np.float32)
        if kind == "frame":
            body = builder.frame_body[idx]
            T = builder.fp[idx]
            pos = T[:3, :3] @ off + T[:3, 3]
        else:
            body, pos = idx, off
        if body < 0:
            raise ValueError(f"contact point {cname!r} attached to the world")
        builder.add_contact_point(cname, body, pos)

    # ---- motors (armature folded into the builder pre-build) -------------
    motor_cfgs = hw.get("Motor", {}).get("SimpleMotor", {})
    motor_names = list(motor_cfgs)
    for mname in motor_names:
        cfg = motor_cfgs[mname]
        jidx = builder.joint_name.index(cfg["joint_name"])
        arm = float(cfg.get("armature", 0.0))
        if arm:
            builder.armature[jidx][:] = arm

    tree = builder.build()

    motors = None
    if motor_names:
        v_idx, q_idx, red, dry, visc, elim, vlim = [], [], [], [], [], [], []
        for mname in motor_names:
            cfg = motor_cfgs[mname]
            j = tree.joint_index(cfg["joint_name"])
            vi = tree.v_off[j]
            v_idx.append(vi)
            q_idx.append(tree.q_off[j])
            red.append(float(cfg.get("mechanicalReduction", 1.0)))
            dry.append(float(cfg.get("frictionDry", 0.0)))
            visc.append(float(cfg.get("frictionViscous", 0.0)))
            elim.append(float(cfg.get("effortLimit", tree.u_max[vi])))
            vlim.append(float(cfg.get("velocityLimit", tree.v_max[vi])))
        motors = Motors.create(
            v_idx,
            q_idx=q_idx,
            names=motor_names,
            reduction=red,
            effort_limit=elim,
            velocity_limit=vlim,
            friction_dry=dry,
            friction_viscous=visc,
        )

    # ---- sensors ----------------------------------------------------------
    specs = []
    type_map = {
        "ImuSensor": ("imu", "frame_name"),
        "EncoderSensor": ("encoder", "joint_name"),
        "EffortSensor": ("effort", None),
        "ContactSensor": ("contact", "frame_name"),
        "ForceSensor": ("force", "frame_name"),
    }
    for section, (typ, key) in type_map.items():
        for sname, cfg in hw.get("Sensor", {}).get(section, {}).items():
            spec = dict(
                type=typ,
                name=sname,
                delay=float(cfg.get("delay", 0.0)),
                bias=float(cfg.get("bias", 0.0)),
                noise_std=float(cfg.get("noiseStd", 0.0)),
            )
            if typ == "effort":
                mj = motor_cfgs[cfg["motor_name"]]["joint_name"]
                spec["target"] = mj
            elif typ == "encoder":
                spec["target"] = cfg["joint_name"]
            elif typ == "contact":
                spec["target"] = cfg["frame_name"]  # a contact point name
            else:
                target = cfg["frame_name"]
                kind, idx = _resolve(info, builder, target)
                if kind == "body":
                    target = tree.body_name[idx] + "_frame"
                spec["target"] = target
            specs.append(spec)
    sensors = SensorSuite.build(tree, specs, sensor_period) if specs else None
    return Robot(
        tree, motors=motors, sensors=sensors, name=name,
        visuals=getattr(builder, "urdf_visuals", None) or None,
        collision_shapes=getattr(builder, "urdf_collisions", None) or None,
    )


def _resolve(info, builder, name):
    """Resolve a URDF link name or frame name to ('frame'|'body', idx)."""
    if name in info:
        return info[name]
    if name in builder.frame_name:
        return ("frame", builder.frame_name.index(name))
    raise KeyError(f"unknown frame/link {name!r}")
