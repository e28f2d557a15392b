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
class CollisionPair:
    """A declared primitive pair to test each substep. ``friction``
    overrides the engine's contact friction for this pair (None =
    engine default)."""

    a: Sphere | Capsule
    b: Sphere | Capsule
    friction: float | None = None


def shape_for_link(robot, link: str, index: int = 0) -> Sphere | Capsule:
    """Pair-collision primitive for a URDF link's parsed ``<collision>``
    geometry (``Robot.collision_shapes``): spheres/capsules pass through
    exactly; a box or an STL mesh becomes its fitted bounding capsule
    (computed at parse time for meshes — io/urdf.py). This is the
    declared-pair analog of the reference's hpp-fcl geometry lookup:
    ``CollisionPair(shape_for_link(r, "l_shin"), shape_for_link(r,
    "r_shin"))``. ``index`` selects among multiple <collision> entries."""
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
        return Capsule(body, tuple(p0), tuple(p1), float(r))
    if g[0] == "box":
        from jiminy_tpu.io.urdf import _fit_capsule

        p0, p1, r = _fit_capsule(np.asarray(g[1], np.float64))
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


class CollisionPairSet:
    """Build-time stacked constants for the declared pairs (numpy —
    baked into the trace; per-pair world geometry is computed each
    substep)."""

    def __init__(self, tree: KinematicTree, pairs, default_friction):
        self.n = len(pairs)
        self.body_a, self.body_b = [], []
        a0, a1, ra, b0, b1, rb, mu = [], [], [], [], [], [], []
        for p in pairs:
            ia = _resolve_body(tree, p.a.body)
            ib = _resolve_body(tree, p.b.body)
            if ia == ib:
                raise ValueError(
                    f"collision pair on the same body {ia} is degenerate"
                )
            self.body_a.append(ia)
            self.body_b.append(ib)
            pa0, pa1, r_a = _endpoints(p.a)
            pb0, pb1, r_b = _endpoints(p.b)
            a0.append(pa0), a1.append(pa1), ra.append(r_a)
            b0.append(pb0), b1.append(pb1), rb.append(r_b)
            mu.append(
                default_friction if p.friction is None else p.friction
            )
        f = lambda x: np.asarray(x, np.float32)
        self.a0, self.a1, self.ra = f(a0), f(a1), f(ra)
        self.b0, self.b1, self.rb = f(b0), f(b1), f(rb)
        self.mu = f(mu)


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
    """Assemble PGS rows for every declared pair: per pair a (3, nv)
    [t1, t2, n] Jacobian block of the RELATIVE surface-point velocity,
    a Baumgarte/margin velocity target (same activation scheme as
    ground contacts — see EngineOptions.contact_margin), an active mask
    and the friction coefficients. Returns (J (3n, nv), target (3n,),
    active (3n,), mu (3n,))."""
    Js, targets, actives, mus = [], [], [], []
    for k in range(pairs.n):
        ba, bb = pairs.body_a[k], pairs.body_b[k]
        pa0 = xw[ba].apply(jnp.asarray(pairs.a0[k], q_dtype))
        pa1 = xw[ba].apply(jnp.asarray(pairs.a1[k], q_dtype))
        pb0 = xw[bb].apply(jnp.asarray(pairs.b0[k], q_dtype))
        pb1 = xw[bb].apply(jnp.asarray(pairs.b1[k], q_dtype))
        ca, cb = closest_segment_segment(pa0, pa1, pb0, pb1)
        d = ca - cb
        dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
        n = d / dist  # from B toward A
        depth = (pairs.ra[k] + pairs.rb[k]) - dist  # >0 = penetrating
        # material surface points (sphere rolls: lever arm included)
        sa = ca - pairs.ra[k] * n
        sb = cb + pairs.rb[k] * n
        # tangent basis orthogonal to n (same construction as
        # constraints.tangent_basis, inlined for a single vector)
        ref = jnp.where(
            jnp.abs(n[0]) < 0.9,
            jnp.array([1.0, 0.0, 0.0], q_dtype),
            jnp.array([0.0, 1.0, 0.0], q_dtype),
        )
        t1 = jnp.cross(n, ref)
        t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1) + 1e-18)
        t2 = jnp.cross(n, t1)
        J_rel = algos.point_jacobian(tree, xw, ba, sa) - algos.point_jacobian(
            tree, xw, bb, sb
        )
        Js.append(jnp.stack([t1 @ J_rel, t2 @ J_rel, n @ J_rel]))
        # penetrating: Baumgarte pushback; hovering within the margin:
        # may approach but not cross this substep (velocity barrier —
        # the contact_margin activation that removed the depth>0 knife
        # edge, engine round-3 fix)
        v_corr = jnp.where(
            depth > 0.0,
            jnp.clip(alpha / dt * (depth - slop), 0.0, max_corr_vel),
            depth / dt,
        )
        targets.append(jnp.array([0.0, 0.0, 1.0], q_dtype) * v_corr)
        actives.append(jnp.repeat(depth > -margin, 3))
        mus.append(
            jnp.broadcast_to(jnp.asarray(pairs.mu[k], q_dtype), (3,))
        )
    return (
        jnp.concatenate(Js, axis=0),
        jnp.concatenate(targets, axis=0),
        jnp.concatenate(actives, axis=0),
        jnp.concatenate(mus, axis=0),
    )
