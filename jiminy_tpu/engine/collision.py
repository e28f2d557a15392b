"""Body-body and self-collision between primitive shapes.

Reference: jiminy manages collision geometry and PAIRS through hpp-fcl —
body-body, self-collision, robot-robot in multi-robot simulations
(SURVEY.md §2.1 "Model": collision geometry & contact-frame management;
§2.1 "Engine": collision detect in the hot loop).

TPU-first redesign: topology is static, so the pair list is DECLARED at
build time (no broad phase — under ``vmap`` every env runs the same
static narrow-phase program; a data-dependent broad phase would force
dynamic shapes). Primitives are spheres and capsules in body frames; the
narrow phase is the branchless closed-form segment-segment closest-point
query (a sphere is a zero-length capsule, so ONE routine covers
sphere-sphere, sphere-capsule and capsule-capsule). Each pair feeds one
[t1, t2, n] friction-cone block into the same PGS solve as ground
contacts, with the engine's Baumgarte/margin activation — so impacts,
resting and sliding behave identically to ground contact physics.

Kernel scope: pairs ride ALL backends — the XLA path assembles rows
here (``pair_rows``), and the whole-substep Pallas kernel runs the
identical narrow phase lane-major in-kernel
(ops/substep_kernel._seg_seg_lane + the pair block in _substep_math),
so self-collision training keeps the flagship fused-kernel speed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree


@dataclasses.dataclass(frozen=True)
class Sphere:
    """Sphere fixed to ``body`` (index or body name) at ``pos`` (body
    frame) with ``radius``."""

    body: int | str
    pos: tuple
    radius: float


@dataclasses.dataclass(frozen=True)
class Capsule:
    """Capsule fixed to ``body``: segment ``p0``→``p1`` (body frame)
    swept by ``radius``."""

    body: int | str
    p0: tuple
    p1: tuple
    radius: float


@dataclasses.dataclass(frozen=True)
class Box:
    """Oriented box fixed to ``body``: center ``pos`` (body frame),
    ``half_extents`` (hx, hy, hz), optional ``rot`` (row-major 3×3 in
    the body frame; None = axis-aligned). Box pairs use the exact box
    signed-distance field — a resting box-on-box contact sits at the
    exact face height, not at a bounding-capsule surface (reference:
    hpp-fcl exact convex distance, SURVEY.md §1 L0)."""

    body: int | str
    pos: tuple
    half_extents: tuple
    rot: tuple | None = None


@dataclasses.dataclass(frozen=True)
class ConvexMesh:
    """Convex support-point cloud fixed to ``body`` (the parse-time STL
    reduction, io/urdf.py) plus its fitted capsule ``(p0, p1, r)``.
    Mesh-vs-box and mesh-vs-capsule pairs test the points against the
    other shape's exact SDF; mesh-vs-mesh tests each cloud against the
    OTHER mesh's fitted capsule (still strictly tighter than
    capsule-vs-capsule)."""

    body: int | str
    points: tuple  # ((x, y, z), ...)
    capsule: tuple | None = None  # (p0, p1, r)


@dataclasses.dataclass(frozen=True)
class CollisionPair:
    """A declared primitive pair to test each substep. ``friction``
    overrides the engine's contact friction for this pair (None =
    engine default)."""

    a: Sphere | Capsule | Box | ConvexMesh
    b: Sphere | Capsule | Box | ConvexMesh
    friction: float | None = None


def shape_for_link(robot, link: str, index: int = 0, exact: bool = True):
    """Pair-collision primitive for a URDF link's parsed ``<collision>``
    geometry (``Robot.collision_shapes``): spheres/capsules pass through
    exactly; a box becomes an exact :class:`Box` and an STL mesh its
    :class:`ConvexMesh` support points (SDF-based narrow phase — the
    analog of the reference's exact hpp-fcl convex distance). Pass
    ``exact=False`` to degrade boxes/meshes to their fitted bounding
    capsule (the pre-round-5 behavior; also what the whole-substep
    kernel can serve in-kernel). ``CollisionPair(shape_for_link(r,
    "l_shin"), shape_for_link(r, "r_shin"))``; ``index`` selects among
    multiple <collision> entries."""
    if link not in robot.collision_shapes:
        raise ValueError(
            f"link {link!r} has no parsed <collision> geometry "
            f"(available: {sorted(robot.collision_shapes)})"
        )
    body, geoms = robot.collision_shapes[link]
    g = geoms[index]
    if g[0] == "sphere":
        return Sphere(body, tuple(np.asarray(g[1], np.float32)), float(g[2]))
    if g[0] == "capsule":
        return Capsule(
            body,
            tuple(np.asarray(g[1], np.float32)),
            tuple(np.asarray(g[2], np.float32)),
            float(g[3]),
        )
    if g[0] == "mesh":
        p0, p1, r = g[2]
        if exact:
            return ConvexMesh(
                body,
                tuple(map(tuple, np.asarray(g[1], np.float32))),
                (tuple(p0), tuple(p1), float(r)),
            )
        return Capsule(body, tuple(p0), tuple(p1), float(r))
    if g[0] == "box":
        corners = np.asarray(g[1], np.float64)  # (8, 3) world of body
        if exact:
            # recover the exact oriented box from the parse-time corner
            # cloud (the enumeration order pins the edge frame, so a
            # rotated <origin> box reconstructs exactly too)
            c = corners.mean(axis=0)
            d = corners - c
            # orthonormal edge frame from the corner layout
            ex = d[4] - d[0]  # +x step in the corner enumeration
            ey = d[2] - d[0]
            ez = d[1] - d[0]
            R = np.stack(
                [ex / np.linalg.norm(ex), ey / np.linalg.norm(ey),
                 ez / np.linalg.norm(ez)], axis=-1
            )
            h = 0.5 * np.array(
                [np.linalg.norm(ex), np.linalg.norm(ey),
                 np.linalg.norm(ez)]
            )
            return Box(
                body, tuple(c.astype(np.float32)),
                tuple(h.astype(np.float32)),
                tuple(map(tuple, R.astype(np.float32))),
            )
        from jiminy_tpu.io.urdf import _fit_capsule

        p0, p1, r = _fit_capsule(corners)
        return Capsule(body, tuple(p0), tuple(p1), float(r))
    raise ValueError(f"unknown collision geometry kind {g[0]!r}")


def _resolve_body(tree: KinematicTree, body: int | str) -> int:
    if isinstance(body, str):
        return tree.body_name.index(body)
    return int(body)


def _endpoints(shape: Sphere | Capsule):
    if isinstance(shape, Sphere):
        return shape.pos, shape.pos, shape.radius
    return shape.p0, shape.p1, shape.radius


def _seg_samples(shape, k: int = 5) -> np.ndarray:
    """(k, 3) points along a capsule's axis (1 point for a sphere) —
    the point-cloud stand-in when a capsule meets a box SDF."""
    p0, p1, _ = _endpoints(shape)
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    if np.allclose(p0, p1):
        return p0[None]
    t = np.linspace(0.0, 1.0, k)[:, None]
    return p0[None] * (1.0 - t) + p1[None] * t


def _box_frame(box: Box):
    c = np.asarray(box.pos, np.float64)
    h = np.asarray(box.half_extents, np.float64)
    R = (
        np.asarray(box.rot, np.float64).reshape(3, 3)
        if box.rot is not None else np.eye(3)
    )
    return c, R, h


def _mesh_capsule(shape: ConvexMesh):
    if shape.capsule is not None:
        return shape.capsule
    from jiminy_tpu.io.urdf import _fit_capsule

    p0, p1, r = _fit_capsule(np.asarray(shape.points, np.float64))
    return tuple(p0), tuple(p1), float(r)


class CollisionPairSet:
    """Build-time constants for the declared pairs (numpy — baked into
    the trace; per-pair world geometry is computed each substep).

    Each pair decomposes into CONTACT GENERATORS:
      - ``seg``: one segment-segment closest-point contact
        (sphere/capsule vs sphere/capsule — the kernel-servable kind)
      - ``ptbox``: k points (with a common sweep radius) tested against
        an oriented-box SDF (box-box → both corner sets, capsule-box →
        sampled axis points, mesh-box → support points)
      - ``ptseg``: k points tested against a capsule SDF (mesh-capsule,
        mesh-sphere; mesh-mesh → each cloud vs the other's fitted
        capsule)
    ``contacts_per_pair`` drives the engine's PGS color layout in BOTH
    backends (pair_rows on XLA, SubstepSpec.pair_gens in-kernel)."""

    def __init__(self, tree: KinematicTree, pairs, default_friction):
        self.n = len(pairs)
        self.gens = []  # (kind, data dict)
        self.contacts_per_pair = []
        for p in pairs:
            ia = _resolve_body(tree, p.a.body)
            ib = _resolve_body(tree, p.b.body)
            if ia == ib:
                raise ValueError(
                    f"collision pair on the same body {ia} is degenerate"
                )
            mu = float(
                default_friction if p.friction is None else p.friction
            )
            n_contacts = 0
            for kind, data in self._decompose(p.a, ia, p.b, ib):
                data["mu"] = mu
                self.gens.append((kind, data))
                n_contacts += (
                    1 if kind == "seg" else len(data["pts"])
                )
            self.contacts_per_pair.append(n_contacts)
        self.total_contacts = sum(self.contacts_per_pair)

    @staticmethod
    def _decompose(sa, ia, sb, ib):
        """Shape pair → generator descriptors (build-time numpy)."""
        seg_like = (Sphere, Capsule)

        def ptbox(b_pts, pts, rp, b_box, box):
            c, R, h = _box_frame(box)
            return (
                "ptbox",
                {
                    "bp": b_pts, "pts": np.asarray(pts, np.float64),
                    "rp": float(rp), "bf": b_box, "c": c, "R": R,
                    "h": h,
                },
            )

        def ptseg(b_pts, pts, rp, b_seg, p0, p1, rs):
            return (
                "ptseg",
                {
                    "bp": b_pts, "pts": np.asarray(pts, np.float64),
                    "rp": float(rp), "bf": b_seg,
                    "p0": np.asarray(p0, np.float64),
                    "p1": np.asarray(p1, np.float64), "rs": float(rs),
                },
            )

        if isinstance(sa, seg_like) and isinstance(sb, seg_like):
            pa0, pa1, r_a = _endpoints(sa)
            pb0, pb1, r_b = _endpoints(sb)
            return [
                (
                    "seg",
                    {
                        "ba": ia, "a0": pa0, "a1": pa1, "ra": r_a,
                        "bb": ib, "b0": pb0, "b1": pb1, "rb": r_b,
                    },
                )
            ]
        if isinstance(sa, Box) and isinstance(sb, Box):
            ca, Ra, ha = _box_frame(sa)
            cb, Rb, hb = _box_frame(sb)
            sgn = np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                 for sz in (-1, 1)], np.float64
            )
            corners_a = (sgn * ha) @ Ra.T + ca
            corners_b = (sgn * hb) @ Rb.T + cb
            return [
                ptbox(ia, corners_a, 0.0, ib, sb),
                ptbox(ib, corners_b, 0.0, ia, sa),
            ]
        if isinstance(sa, Box) or isinstance(sb, Box):
            box, b_box = (sa, ia) if isinstance(sa, Box) else (sb, ib)
            other, b_other = (sb, ib) if isinstance(sa, Box) else (sa, ia)
            if isinstance(other, seg_like):
                return [
                    ptbox(
                        b_other, _seg_samples(other),
                        _endpoints(other)[2], b_box, box,
                    )
                ]
            if isinstance(other, ConvexMesh):
                return [
                    ptbox(
                        b_other, np.asarray(other.points, np.float64),
                        0.0, b_box, box,
                    )
                ]
        if isinstance(sa, ConvexMesh) and isinstance(sb, ConvexMesh):
            pa0, pa1, r_a = _mesh_capsule(sa)
            pb0, pb1, r_b = _mesh_capsule(sb)
            return [
                ptseg(ia, sa.points, 0.0, ib, pb0, pb1, r_b),
                ptseg(ib, sb.points, 0.0, ia, pa0, pa1, r_a),
            ]
        if isinstance(sa, ConvexMesh) or isinstance(sb, ConvexMesh):
            mesh, b_mesh = (
                (sa, ia) if isinstance(sa, ConvexMesh) else (sb, ib)
            )
            other, b_other = (
                (sb, ib) if isinstance(sa, ConvexMesh) else (sa, ia)
            )
            p0, p1, rs = _endpoints(other)
            return [
                ptseg(b_mesh, mesh.points, 0.0, b_other, p0, p1, rs)
            ]
        raise ValueError(
            f"unsupported collision pair {type(sa).__name__} vs "
            f"{type(sb).__name__}"
        )


def closest_segment_segment(p1, q1, p2, q2, eps=1e-9):
    """Closest points between segments [p1,q1] and [p2,q2] (world),
    branchless (Ericson §5.1.9 with jnp.where in place of branches —
    vmap/jit safe, no data-dependent control flow). Returns (ca, cb)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    # s on segment 1 for infinite-line closest approach, clamped
    s = jnp.where(
        denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0
    )
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    # re-clamp: if t left [0,1], recompute s at the clamped t
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
    return p1 + s[..., None] * d1, p2 + t[..., None] * d2


def box_sdf(pl: jax.Array, h) -> tuple[jax.Array, jax.Array]:
    """Exact oriented-box signed distance + outward normal for points
    ``pl`` (k, 3) in the BOX frame with half-extents ``h`` (3,) —
    branchless (interior gradient = the axis of least penetration)."""
    h = jnp.asarray(h, pl.dtype)
    q = jnp.abs(pl) - h
    out = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(out * out, axis=-1) + 1e-18)
    m = jnp.max(q, axis=-1)
    sdf = d_out + jnp.minimum(m, 0.0)
    sgn = jnp.where(pl >= 0, 1.0, -1.0)
    g_out = sgn * out / d_out[:, None]
    one = (q >= m[:, None] - 1e-12).astype(pl.dtype)
    g_in = sgn * one / jnp.sum(one, axis=-1, keepdims=True)
    n_l = jnp.where((m < 0.0)[:, None], g_in, g_out)
    return sdf, n_l


def _contact_rows(tree, xw, q_dtype, dt, alpha, margin, slop,
                  max_corr_vel, b_pt, sa, b_field, sb, n, depth, mu):
    """One point contact → (J (3, nv), target (3,), active (3,),
    mu (3,)) — shared row math for every generator kind (identical
    Baumgarte/margin scheme to ground contacts)."""
    ref = jnp.where(
        jnp.abs(n[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], q_dtype),
        jnp.array([0.0, 1.0, 0.0], q_dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1) + 1e-18)
    t2 = jnp.cross(n, t1)
    J_rel = algos.point_jacobian(tree, xw, b_pt, sa) - algos.point_jacobian(
        tree, xw, b_field, sb
    )
    J = jnp.stack([t1 @ J_rel, t2 @ J_rel, n @ J_rel])
    # penetrating: Baumgarte pushback; hovering within the margin: may
    # approach but not cross this substep (velocity barrier — the
    # contact_margin activation, engine round-3 fix)
    v_corr = jnp.where(
        depth > 0.0,
        jnp.clip(alpha / dt * (depth - slop), 0.0, max_corr_vel),
        depth / dt,
    )
    target = jnp.array([0.0, 0.0, 1.0], q_dtype) * v_corr
    active = jnp.repeat(depth > -margin, 3)
    mu3 = jnp.broadcast_to(jnp.asarray(mu, q_dtype), (3,))
    return J, target, active, mu3


def pair_rows(
    pairs: CollisionPairSet,
    tree: KinematicTree,
    xw,
    q_dtype,
    dt,
    alpha,
    margin,
    slop,
    max_corr_vel,
):
    """Assemble PGS rows for every declared pair: per CONTACT a (3, nv)
    [t1, t2, n] Jacobian block of the RELATIVE surface-point velocity,
    a Baumgarte/margin velocity target (same activation scheme as
    ground contacts — see EngineOptions.contact_margin), an active mask
    and the friction coefficients. Returns (J (3N, nv), target (3N,),
    active (3N,), mu (3N,)) with N = pairs.total_contacts."""
    Js, targets, actives, mus = [], [], [], []

    def emit(b_pt, sa, b_field, sb, n, depth, mu):
        J, tgt, act, mu3 = _contact_rows(
            tree, xw, q_dtype, dt, alpha, margin, slop, max_corr_vel,
            b_pt, sa, b_field, sb, n, depth, mu,
        )
        Js.append(J)
        targets.append(tgt)
        actives.append(act)
        mus.append(mu3)

    for kind, g in pairs.gens:
        if kind == "seg":
            ba, bb = g["ba"], g["bb"]
            pa0 = xw[ba].apply(jnp.asarray(g["a0"], q_dtype))
            pa1 = xw[ba].apply(jnp.asarray(g["a1"], q_dtype))
            pb0 = xw[bb].apply(jnp.asarray(g["b0"], q_dtype))
            pb1 = xw[bb].apply(jnp.asarray(g["b1"], q_dtype))
            ca, cb = closest_segment_segment(pa0, pa1, pb0, pb1)
            d = ca - cb
            dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
            n = d / dist  # from B toward A
            depth = (g["ra"] + g["rb"]) - dist  # >0 = penetrating
            # material surface points (sphere rolls: lever arm included)
            sa = ca - g["ra"] * n
            sb = cb + g["rb"] * n
            emit(ba, sa, bb, sb, n, depth, g["mu"])
            continue
        bp, bf, rp = g["bp"], g["bf"], g["rp"]
        pts_l = jnp.asarray(g["pts"], q_dtype)  # (k, 3) body frame
        pw = pts_l @ xw[bp].rot.T + xw[bp].pos  # world points
        if kind == "ptbox":
            c_w = xw[bf].apply(jnp.asarray(g["c"], q_dtype))
            R_w = xw[bf].rot @ jnp.asarray(g["R"], q_dtype)
            pl = (pw - c_w) @ R_w  # box frame
            sdf, n_l = box_sdf(pl, g["h"])
            n_w = n_l @ R_w.T  # outward from the box → toward the point
            depth = rp - sdf
            # sa on the point body's sphere surface; sb on the box face
            sa_all = pw - rp * n_w
            sb_all = pw - sdf[:, None] * n_w
        else:  # ptseg: points vs a capsule on bf
            p0 = xw[bf].apply(jnp.asarray(g["p0"], q_dtype))
            p1 = xw[bf].apply(jnp.asarray(g["p1"], q_dtype))
            seg = p1 - p0
            denom = jnp.maximum(jnp.sum(seg * seg), 1e-12)
            s = jnp.clip((pw - p0) @ seg / denom, 0.0, 1.0)
            cpt = p0 + s[:, None] * seg
            d = pw - cpt
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
            n_w = d / dist[:, None]
            depth = (rp + g["rs"]) - dist
            sa_all = pw - rp * n_w
            sb_all = cpt + g["rs"] * n_w
        for i in range(len(g["pts"])):  # static unroll per point
            emit(
                bp, sa_all[i], bf, sb_all[i], n_w[i], depth[i], g["mu"]
            )
    return (
        jnp.concatenate(Js, axis=0),
        jnp.concatenate(targets, axis=0),
        jnp.concatenate(actives, axis=0),
        jnp.concatenate(mus, axis=0),
    )
