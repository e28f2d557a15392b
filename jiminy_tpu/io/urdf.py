"""URDF loader: robot description XML → TreeBuilder / KinematicTree.

Reference behavior: jiminy builds its model from a URDF via Pinocchio's
parser, with a ``freeflyer`` option to root the robot on a floating base
(SURVEY.md §2.3 "Simulator": build from URDF). This is a from-scratch
parser targeting the URDF subset used by robot-simulation assets:

- joints: revolute, continuous, prismatic, fixed, floating
- link <inertial> with origin (xyz, rpy), mass, full inertia tensor
- joint <origin>, <axis>, <limit effort/velocity/lower/upper>,
  <dynamics damping/friction>
- fixed links are fused into their parent (inertia composition) and kept
  as operational frames, matching the reference's model reduction.

Unsupported (rejected loudly): planar joints, mimic joints.
<visual> geometry is ignored. <collision> sphere/capsule/cylinder/box
primitives are parsed into per-link footprint candidates; the hardware
description opts links in via ``[Global] collisionBodyNames`` (mirrors
the reference's collision-bodies list; SURVEY.md §2.1 "Model").
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

from jiminy_tpu.core.tree import JointType, KinematicTree, TreeBuilder


def _floats(s: str | None, n: int, default=0.0) -> np.ndarray:
    if not s:
        return np.full(n, default, dtype=np.float32)
    return np.asarray([float(x) for x in s.split()], dtype=np.float32)


def _origin(elem) -> np.ndarray:
    """<origin xyz rpy> → 4×4 homogeneous matrix."""
    if elem is None:
        return np.eye(4, dtype=np.float32)
    xyz = _floats(elem.get("xyz"), 3)
    rpy = _floats(elem.get("rpy"), 3)
    return TreeBuilder.make_placement(pos=xyz, rpy=rpy)


def _inertial(link) -> tuple[float, np.ndarray, np.ndarray]:
    """(mass, com_in_link, inertia_about_com_in_link)."""
    ine = link.find("inertial")
    if ine is None:
        return 0.0, np.zeros(3, np.float32), np.zeros((3, 3), np.float32)
    T = _origin(ine.find("origin"))
    R, p = T[:3, :3], T[:3, 3]
    mass_e = ine.find("mass")
    mass = float(mass_e.get("value")) if mass_e is not None else 0.0
    it = ine.find("inertia")
    if it is None:
        I = np.zeros((3, 3), np.float32)
    else:
        ixx = float(it.get("ixx", 0.0))
        iyy = float(it.get("iyy", 0.0))
        izz = float(it.get("izz", 0.0))
        ixy = float(it.get("ixy", 0.0))
        ixz = float(it.get("ixz", 0.0))
        iyz = float(it.get("iyz", 0.0))
        I = np.array(
            [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]], np.float32
        )
    # rotate the inertia frame into the link frame; com offset by origin
    return mass, p.astype(np.float32), (R @ I @ R.T).astype(np.float32)


_JOINT_MAP = {
    "revolute": JointType.REVOLUTE,
    "continuous": JointType.REVOLUTE,
    "prismatic": JointType.PRISMATIC,
    "floating": JointType.FREE,
}


def parse_urdf(
    source: str | Path,
    freeflyer: bool = False,
    gravity=(0.0, 0.0, -9.81),
) -> tuple[TreeBuilder, dict]:
    """Parse a URDF file path or XML string into a TreeBuilder.

    ``freeflyer=True`` roots the robot on a FREE joint (the reference's
    ``has_freeflyer`` option for legged robots). Returns (builder, info)
    where info maps link names → ("body", idx) or ("frame", idx)."""
    text = str(source)
    if "<robot" not in text:
        text = Path(source).read_text()
    root = ET.fromstring(text)
    if root.tag != "robot":
        raise ValueError(f"not a URDF: root tag {root.tag!r}")

    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))
    for j in joints:
        if j.find("mimic") is not None:
            raise ValueError(f"mimic joints unsupported: {j.get('name')}")
        if j.get("type") not in _JOINT_MAP and j.get("type") != "fixed":
            raise ValueError(
                f"unsupported joint type {j.get('type')!r}: {j.get('name')}"
            )

    children = {}  # parent link → [(joint, child link)]
    child_links = set()
    for j in joints:
        pl = j.find("parent").get("link")
        cl = j.find("child").get("link")
        children.setdefault(pl, []).append((j, cl))
        child_links.add(cl)
    roots = [n for n in links if n not in child_links]
    if len(roots) != 1:
        raise ValueError(f"expected one root link, got {roots}")
    root_link = roots[0]

    b = TreeBuilder(gravity=gravity)
    # link name → ("body", body_idx) | ("frame", frame_idx)
    info: dict[str, tuple[str, int]] = {}
    # link name → (builder body idx carrying it, offset 4×4 from that body)
    carrier: dict[str, tuple[int, np.ndarray]] = {}

    mass, com, inertia = _inertial(links[root_link])
    if freeflyer:
        idx = b.add_body(
            root_link,
            parent=-1,
            joint_type=JointType.FREE,
            mass=mass,
            com=com,
            inertia=inertia,
            joint_name="root_joint",
        )
        info[root_link] = ("body", idx)
        carrier[root_link] = (idx, np.eye(4, dtype=np.float32))
        b.add_frame(root_link + "_frame", idx)
    else:
        # static root: children of the root attach to the world (-1);
        # root-link inertia is dropped (it is fixed to the world)
        f = b.fuse_fixed_body(root_link, -1, np.eye(4, dtype=np.float32))
        info[root_link] = ("frame", f)
        carrier[root_link] = (-1, np.eye(4, dtype=np.float32))

    stack = [root_link]
    while stack:
        parent_link = stack.pop()
        p_body, p_off = carrier[parent_link]
        for j, child in children.get(parent_link, []):
            T = p_off @ _origin(j.find("origin"))
            mass, com, inertia = _inertial(links[child])
            jtype = j.get("type")
            if jtype == "fixed":
                if p_body < 0:
                    f = b.fuse_fixed_body(child, -1, T)
                else:
                    f = b.fuse_fixed_body(
                        child, p_body, T, mass=mass, com=com, inertia=inertia
                    )
                info[child] = ("frame", f)
                carrier[child] = (p_body, T)
            else:
                axis_e = j.find("axis")
                axis = (
                    _floats(axis_e.get("xyz"), 3)
                    if axis_e is not None
                    else np.array([1.0, 0.0, 0.0], np.float32)
                )
                lim = j.find("limit")
                kwargs = {}
                if lim is not None and jtype in ("revolute", "prismatic"):
                    lo = float(lim.get("lower", -1e6))
                    hi = float(lim.get("upper", 1e6))
                    kwargs["q_limits"] = (lo, hi)
                if lim is not None:
                    kwargs["u_max"] = float(lim.get("effort", 1e6))
                    kwargs["v_max"] = float(lim.get("velocity", 1e6))
                dyn = j.find("dynamics")
                damping = float(dyn.get("damping", 0.0)) if dyn is not None else 0.0
                idx = b.add_body(
                    child,
                    parent=p_body,
                    joint_type=_JOINT_MAP[jtype],
                    placement=T,
                    axis=axis,
                    mass=mass,
                    com=com,
                    inertia=inertia,
                    joint_name=j.get("name"),
                    damping=damping,
                    **kwargs,
                )
                info[child] = ("body", idx)
                carrier[child] = (idx, np.eye(4, dtype=np.float32))
                b.add_frame(child + "_frame", idx)
            stack.append(child)

    # ---- <collision> primitives → ground-contact footprint candidates --
    # Stored per link on the builder; attached as contact spheres only
    # for links the hardware description opts in via
    # ``[Global] collisionBodyNames`` (the reference's collision bodies
    # list resolved through hpp-fcl; here analytic primitives-vs-ground,
    # SURVEY.md §2.1 "Model"). Each entry: ("sphere", center(3), r) or
    # ("capsule", p0(3), p1(3), r) or ("box", corners(8,3)) — in the
    # CARRIER body frame (fused fixed links folded in).
    b.urdf_collisions = {}
    for lname, link in links.items():
        if lname not in carrier:
            continue
        body, T_link = carrier[lname]
        geoms = []
        for col in link.findall("collision"):
            T = T_link @ _origin(col.find("origin"))
            g = col.find("geometry")
            if g is None:
                continue
            R, p = T[:3, :3], T[:3, 3]
            sph = g.find("sphere")
            cap = g.find("capsule")
            cyl = g.find("cylinder")
            box = g.find("box")
            if sph is not None:
                geoms.append(("sphere", p.copy(), float(sph.get("radius"))))
            elif cap is not None or cyl is not None:
                e = cap if cap is not None else cyl
                r = float(e.get("radius"))
                half = 0.5 * float(e.get("length"))
                z = R[:, 2]
                geoms.append(("capsule", p - half * z, p + half * z, r))
            elif box is not None:
                hx, hy, hz = 0.5 * _floats(box.get("size"), 3)
                corners = np.stack(
                    [
                        R @ np.array([sx, sy, sz], np.float32) + p
                        for sx in (-hx, hx)
                        for sy in (-hy, hy)
                        for sz in (-hz, hz)
                    ]
                )
                geoms.append(("box", corners))
        if geoms:
            b.urdf_collisions[lname] = (body, geoms)

    # ---- <visual> (falling back to <collision>) display geometry -------
    # Full-fidelity primitives for the 3-D viewer (reference renders the
    # robot's meshes through meshcat/panda3d, SURVEY.md §2.3 "Viewer /
    # replay"; here primitives + STL meshes, rendered dependency-free).
    # Each entry: {"type": "sphere"|"capsule"|"cylinder"|"box"|"mesh",
    # "R": (3,3), "p": (3,), ...type params}, in the CARRIER body frame.
    b.urdf_visuals = {}
    for lname, link in links.items():
        if lname not in carrier:
            continue
        body, T_link = carrier[lname]
        elems = link.findall("visual") or link.findall("collision")
        geoms = []
        for el in elems:
            g = el.find("geometry")
            if g is None:
                continue
            T = T_link @ _origin(el.find("origin"))
            R, p = T[:3, :3].copy(), T[:3, 3].copy()
            sph, cap, cyl, box, mesh = (
                g.find(k) for k in
                ("sphere", "capsule", "cylinder", "box", "mesh")
            )
            if sph is not None:
                geoms.append({"type": "sphere", "R": R, "p": p,
                              "radius": float(sph.get("radius"))})
            elif cap is not None:
                geoms.append({"type": "capsule", "R": R, "p": p,
                              "radius": float(cap.get("radius")),
                              "length": float(cap.get("length"))})
            elif cyl is not None:
                geoms.append({"type": "cylinder", "R": R, "p": p,
                              "radius": float(cyl.get("radius")),
                              "length": float(cyl.get("length"))})
            elif box is not None:
                geoms.append({"type": "box", "R": R, "p": p,
                              "size": _floats(box.get("size"), 3)})
            elif mesh is not None:
                scale = _floats(mesh.get("scale"), 3, default=1.0)
                geoms.append({"type": "mesh", "R": R, "p": p,
                              "filename": mesh.get("filename") or "",
                              "scale": scale})
        if geoms:
            b.urdf_visuals.setdefault(body, []).extend(geoms)
    return b, info


def load_urdf(
    source: str | Path,
    freeflyer: bool = False,
    gravity=(0.0, 0.0, -9.81),
) -> KinematicTree:
    """Parse and build in one call."""
    b, _ = parse_urdf(source, freeflyer=freeflyer, gravity=gravity)
    return b.build()
