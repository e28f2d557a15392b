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

<collision><mesh> (STL) is supported the TPU way: where the reference
hands the triangle soup to hpp-fcl's BVH at runtime, here the mesh is
reduced AT BUILD TIME to (a) its convex support points — the extreme
vertex along each of 26 sphere directions, i.e. exactly the hull
vertices that can touch the ground first — which become static contact
sites, and (b) a fitted bounding capsule for body-body pair collision
(engine/collision.py). Static shapes, no runtime BVH traversal, no
gathers in the hot loop.
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


def _support_directions(n_extra: int = 0) -> np.ndarray:
    """26 cube face/edge/corner unit directions (+ optional golden-spiral
    extras) — support mapping along these yields the convex-hull extreme
    vertices of a point cloud."""
    dirs = [
        np.array([x, y, z], np.float64)
        for x in (-1.0, 0.0, 1.0)
        for y in (-1.0, 0.0, 1.0)
        for z in (-1.0, 0.0, 1.0)
        if (x, y, z) != (0.0, 0.0, 0.0)
    ]
    if n_extra:
        i = np.arange(n_extra, dtype=np.float64) + 0.5
        phi = np.arccos(1.0 - 2.0 * i / n_extra)
        theta = np.pi * (1.0 + 5.0**0.5) * i
        dirs += list(
            np.stack(
                [np.sin(phi) * np.cos(theta),
                 np.sin(phi) * np.sin(theta),
                 np.cos(phi)], axis=-1
            )
        )
    d = np.stack(dirs)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def _fit_capsule(v: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Bounding capsule of a vertex cloud: segment along the principal
    axis, radius = max perpendicular distance, end caps pulled in by the
    radius (an approximation — slightly loose at the ends — standing in
    for the reference's exact hpp-fcl mesh BVH)."""
    c = v.mean(axis=0)
    d = v - c
    # principal axis from the 3×3 scatter matrix (tiny, exact)
    _, vecs = np.linalg.eigh(d.T @ d)
    u = vecs[:, -1]
    t = d @ u
    r = float(np.sqrt(np.maximum(np.sum(d * d, axis=-1) - t * t, 0.0)).max())
    lo, hi = float(t.min()), float(t.max())
    if hi - lo > 2.0 * r:  # elongated: pull the end caps in
        lo, hi = lo + r, hi - r
    else:  # chunky mesh: degenerate to a sphere at the centroid
        lo = hi = 0.5 * (lo + hi)
    p0, p1 = c + lo * u, c + hi * u
    # expand the radius so every vertex is truly inside: max distance
    # from the cloud to the [p0, p1] segment
    seg = p1 - p0
    denom = float(seg @ seg)
    s = (
        np.clip(((v - p0) @ seg) / denom, 0.0, 1.0)
        if denom > 1e-12
        else np.zeros(len(v))
    )
    closest = p0 + s[:, None] * seg
    r = max(r, float(np.linalg.norm(v - closest, axis=-1).max()))
    return p0.astype(np.float32), p1.astype(np.float32), r


def _mesh_collision(
    mesh_elem, T: np.ndarray, mesh_dir: Path | None, max_points: int = 32,
    n_extra_dirs: int = 14, link_name: str = "?",
):
    """<collision><mesh> → ("mesh", support_pts (k,3), (p0, p1, r))
    in the carrier body frame, or None if the STL can't be resolved.
    The reduction error (max support-function deficit of the kept point
    set vs the full vertex cloud over a dense direction sample — an
    upper bound on extra ground penetration vs the reference's exact
    hpp-fcl BVH) is measured and surfaced as a warning when it exceeds
    1 mm (ADVICE r4 #3)."""
    from jiminy_tpu.viewer3d import read_stl  # numpy-only STL parser

    fn = (mesh_elem.get("filename") or "").removeprefix("package://")
    cands = [Path(fn)]
    if mesh_dir is not None:
        cands += [mesh_dir / fn, mesh_dir / Path(fn).name]
    path = next((c for c in cands if c.is_file()), None)
    if path is None or path.suffix.lower() != ".stl":
        return None
    scale = _floats(mesh_elem.get("scale"), 3, default=1.0)
    v, _ = read_stl(path, scale)
    R, p = T[:3, :3].astype(np.float64), T[:3, 3].astype(np.float64)
    v = v @ R.T + p
    idx = np.unique(
        np.argmax(v @ _support_directions(n_extra_dirs).T, axis=0)
    )
    pts = v[idx]
    if len(pts) > max_points:  # farthest-point thinning, deterministic
        keep = [int(np.argmax(pts[:, 2]))]
        d2 = np.sum((pts - pts[keep[0]]) ** 2, axis=-1)
        while len(keep) < max_points:
            nxt = int(np.argmax(d2))
            keep.append(nxt)
            d2 = np.minimum(d2, np.sum((pts - pts[nxt]) ** 2, axis=-1))
        pts = pts[keep]
    # penetration bound of the reduction: max over a dense direction
    # sample of (true support − kept-set support)
    probe = _support_directions(100).T
    err = float(np.max(np.max(v @ probe, 0) - np.max(pts @ probe, 0)))
    if err > 1e-3:
        import warnings

        warnings.warn(
            f"collision mesh {path.name!r} on link {link_name!r}: "
            f"support-point reduction (max_points={max_points}) can "
            f"under-resolve the surface by up to {1e3 * err:.1f} mm — "
            "raise mesh_max_points in parse_urdf/load if this matters",
            stacklevel=2,
        )
    return ("mesh", pts.astype(np.float32), _fit_capsule(v))


def parse_urdf(
    source: str | Path,
    freeflyer: bool = False,
    gravity=(0.0, 0.0, -9.81),
    mesh_max_points: int = 32,
) -> tuple[TreeBuilder, dict]:
    """Parse a URDF file path or XML string into a TreeBuilder.

    ``freeflyer=True`` roots the robot on a FREE joint (the reference's
    ``has_freeflyer`` option for legged robots). Returns (builder, info)
    where info maps link names → ("body", idx) or ("frame", idx).
    ``mesh_max_points`` caps the support-point reduction of each
    <collision> STL (a warning reports the measured penetration bound
    when the cap bites — raise it for large concave meshes)."""
    text = str(source)
    urdf_dir = None
    if "<robot" not in text:
        urdf_dir = Path(source).resolve().parent
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
    b.urdf_dir = urdf_dir
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
            msh = g.find("mesh")
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
            elif msh is not None:
                entry = _mesh_collision(
                    msh, T, urdf_dir, max_points=mesh_max_points,
                    link_name=lname,
                )
                if entry is not None:
                    geoms.append(entry)
                else:
                    # loud skip (ADVICE r4 #2): previously a link mixing
                    # a primitive and an unresolvable/non-STL mesh lost
                    # the mesh with no diagnostic
                    import warnings

                    warnings.warn(
                        f"<collision> mesh "
                        f"{msh.get('filename')!r} on link {lname!r} "
                        "skipped (unresolvable path or non-STL format)",
                        stacklevel=2,
                    )
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
