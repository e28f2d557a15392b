"""Spring-damper contact model (penalty formulation).

Reference: jiminy's ``contactModel = "spring_damper"`` option — penalty
normal force from penetration depth/velocity plus regularized Coulomb
friction with a smooth transition below ``transitionVelocity``
(SURVEY.md §2.1 "Contact model", computeContactDynamicsAtBody/Frame).

All contact points of a robot are processed as one stacked (ncp, ...)
computation; under ``vmap`` this becomes (batch, ncp, ...) — wide VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree
from jiminy_tpu.math.spatial import Transform


class ContactParams(struct.PyTreeNode):
    """Mirrors the reference's ``engine.contacts`` option block."""

    stiffness: jax.Array = struct.field(default_factory=lambda: jnp.float32(1e5))
    damping: jax.Array = struct.field(default_factory=lambda: jnp.float32(2e3))
    friction: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    # velocity below which friction is viscous (regularization), m/s
    transition_velocity: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.01)
    )
    # depth over which the normal force ramps in smoothly, m
    transition_eps: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(1e-3)
    )


def contact_points_world(
    tree: KinematicTree,
    xw: list[Transform],
    vel: list[jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """World positions (ncp, 3) and velocities (ncp, 3) of all contact
    site CENTERS (sphere sites: the sphere center, not the surface)."""
    ps, vs = [], []
    for k in range(tree.ncp):
        b = tree.contact_body[k]
        p_local = tree.contact_pos[k]
        ps.append(xw[b].apply(p_local))
        w_l, v_l = vel[b][:3], vel[b][3:]
        vs.append(xw[b].rot @ (v_l + jnp.cross(w_l, p_local)))
    return jnp.stack(ps), jnp.stack(vs)


def has_spheres(tree: KinematicTree) -> bool:
    """Static (trace-time) check: any contact site with radius > 0."""
    return tree.ncp > 0 and bool(np.any(np.asarray(tree.contact_radius) > 0))


def surface_contacts(
    tree: KinematicTree,
    xw: list[Transform],
    vel: list[jax.Array],
    ground,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-substep contact manifolds for all sites vs the ground:
    (points (ncp,3), velocities (ncp,3), depth (ncp,), normal (ncp,3)).

    Bare points (r=0): the fixed body point, exactly as before. Sphere
    sites (r>0): the surface point center − r·n̂ — the material point
    that actually touches, so its Jacobian carries the ω×(−r·n̂) lever
    arm that makes spheres ROLL under friction. Two-pass query: normal
    at the center's xy picks the surface point; height at the surface
    point's xy gives the depth (exact on flat ground, first-order on
    curved terrain — same scheme in the substep kernel, so backends
    agree). Reference: hpp-fcl primitive-vs-ground collision pairs
    (SURVEY.md §2.1 "Model"), redesigned analytic for TPU."""
    centers, v_c = contact_points_world(tree, xw, vel)
    if not has_spheres(tree):
        h, n = ground.query(centers[..., :2])
        return centers, v_c, h - centers[..., 2], n
    r = tree.contact_radius[:, None]
    _, n1 = ground.query(centers[..., :2])
    pts = centers - r * n1
    h2, n2 = ground.query(pts[..., :2])
    depth = h2 - pts[..., 2]
    # velocity of the material point at the surface offset:
    # v_p = v_c + ω × (p − c), all in world frame
    omegas = jnp.stack(
        [
            xw[tree.contact_body[k]].rot @ vel[tree.contact_body[k]][:3]
            for k in range(tree.ncp)
        ]
    )
    v_p = v_c + jnp.cross(omegas, pts - centers)
    return pts, v_p, depth, n2


def spring_damper_forces(
    points: jax.Array,  # (ncp, 3) world positions
    velocities: jax.Array,  # (ncp, 3) world velocities
    ground,
    params: ContactParams,
) -> jax.Array:
    """Penalty forces for bare points (queries the ground itself)."""
    h, n = ground.query(points[..., :2])
    return penalty_forces(h - points[..., 2], n, velocities, params)


def penalty_forces(
    depth: jax.Array,  # (ncp,) penetration (> 0 below the surface)
    n: jax.Array,  # (ncp, 3) surface normals
    velocities: jax.Array,  # (ncp, 3) world velocities of contact points
    params: ContactParams,
    dt: float | None = None,
    m_eff: jax.Array | np.ndarray | None = None,
) -> jax.Array:
    """World-frame contact force (ncp, 3) at each point.

    f_n = (k·δ − d·δ̇)₊ · n, active only when penetrating (δ > 0), with a
    smooth ramp over ``transition_eps``; friction is Coulomb clamped,
    viscous below ``transition_velocity`` (matches the reference's smooth
    transition behavior).

    Stability clamp (``dt`` + ``m_eff``): the regularized-friction slope
    μ·f_n/v_tr integrated explicitly diverges when slope·dt outruns the
    tangential effective mass at the contact (the leg's reflected
    inertia — ~0.5 kg at an ANYmal foot, NOT the supported weight).
    With both given, the transition band widens elementwise to
    max(v_tr, μ·f_n·dt / (2·m_eff)), capping slope·dt/m_eff at 2 (the
    empirical blow-up sits at ≈5–6 for a PD-held ANYmal stance, which
    collapsed at default v_tr before this clamp). Fine-dt behavior and
    the dt-free adaptive-stepper ODE right-hand side are untouched."""
    v_n = jnp.sum(velocities * n, axis=-1)
    # smooth activation over transition_eps avoids a hard discontinuity
    act = jnp.clip(depth / params.transition_eps, 0.0, 1.0)
    f_n = jnp.maximum(
        params.stiffness * depth - params.damping * v_n, 0.0
    ) * act
    v_t = velocities - v_n[..., None] * n
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    v_tr = params.transition_velocity
    if dt is not None and m_eff is not None:
        v_tr = jnp.maximum(
            v_tr, params.friction * f_n * dt / (2.0 * jnp.asarray(m_eff))
        )
    # regularized Coulomb: ratio → μ for vt >> v_transition, linear below
    scale = jnp.minimum(vt_norm / v_tr, 1.0)
    f_t_mag = params.friction * f_n * scale
    t_dir = v_t / jnp.maximum(vt_norm, 1e-9)[..., None]
    return f_n[..., None] * n - f_t_mag[..., None] * t_dir


def forces_to_fext(
    tree: KinematicTree,
    xw: list[Transform],
    forces_world: jax.Array,  # (ncp, 3)
    points_world: jax.Array,  # (ncp, 3)
) -> jax.Array:
    """Accumulate world point forces into per-body local spatial wrenches
    (nb, 6) at body origins — the f_ext input of ``algos.aba``."""
    fext = jnp.zeros((tree.nb, 6), dtype=forces_world.dtype)
    for k in range(tree.ncp):
        b = tree.contact_body[k]
        f_w = forces_world[k]
        r = points_world[k] - xw[b].pos
        n_w = jnp.cross(r, f_w)
        Rt = xw[b].rot.T
        wrench = jnp.concatenate([Rt @ n_w, Rt @ f_w])
        fext = fext.at[b].add(wrench)
    return fext


def contact_effective_mass(tree: KinematicTree) -> np.ndarray:
    """Static per-contact TANGENTIAL effective mass (ncp,) from the
    Delassus diagonal at the neutral configuration:
    m_eff = 1 / max(diag(J·M⁻¹·Jᵀ)_xx, _yy). Build-time only (numpy);
    bounds the explicitly-integrated friction slope in
    :func:`penalty_forces` — the leg's reflected inertia, not the
    supported weight, is what reacts to tangential contact force."""
    import jax.numpy as jnp

    # eager build-time math: pin to the host CPU device so constructing
    # an engine under an active TPU backend doesn't pay one tunnel
    # round trip per op (axon quirk — see docs/tpu_performance.md)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        q = tree.neutral_q()
        xw, _ = algos.kinematics(tree, q, jnp.zeros(tree.nv))
        M = np.asarray(algos.crba(tree, q), np.float64)
        Minv = np.linalg.inv(M)
        out = []
        for k in range(tree.ncp):
            b = tree.contact_body[k]
            p = xw[b].apply(tree.contact_pos[k])
            J = np.asarray(
                algos.point_jacobian(tree, xw, b, p), np.float64
            )
            W = J @ Minv @ J.T
            out.append(1.0 / max(W[0, 0], W[1, 1], 1e-9))
    return np.asarray(out, np.float32)


def compute_contact_fext(
    tree: KinematicTree,
    xw: list[Transform],
    vel: list[jax.Array],
    ground,
    params: ContactParams,
    dt: float | None = None,
    m_eff=None,
) -> tuple[jax.Array, jax.Array]:
    """Full spring-damper pipeline: returns (fext (nb,6) local wrenches,
    forces_world (ncp,3) for telemetry/sensors). ``dt``/``m_eff``:
    integrator step + per-contact tangential effective mass for the
    friction stability clamp (see :func:`penalty_forces`)."""
    if tree.ncp == 0:
        return jnp.zeros((tree.nb, 6)), jnp.zeros((0, 3))
    pts, vels, depth, n = surface_contacts(tree, xw, vel, ground)
    f_w = penalty_forces(depth, n, vels, params, dt=dt, m_eff=m_eff)
    return forces_to_fext(tree, xw, f_w, pts), f_w
