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
    points."""
    ps, vs = [], []
    for k in range(tree.ncp):
        b = tree.contact_body[k]
        p_local = tree.contact_pos[k]
        ps.append(xw[b].apply(p_local))
        w_l, v_l = vel[b][:3], vel[b][3:]
        vs.append(xw[b].rot @ (v_l + jnp.cross(w_l, p_local)))
    return jnp.stack(ps), jnp.stack(vs)


def spring_damper_forces(
    points: jax.Array,  # (ncp, 3) world positions
    velocities: jax.Array,  # (ncp, 3) world velocities
    ground,
    params: ContactParams,
) -> jax.Array:
    """World-frame contact force (ncp, 3) at each point.

    f_n = (k·δ − d·δ̇)₊ · n, active only when penetrating (δ > 0), with a
    smooth ramp over ``transition_eps``; friction is Coulomb clamped,
    viscous below ``transition_velocity`` (matches the reference's smooth
    transition behavior)."""
    h, n = ground.query(points[..., :2])
    depth = h - points[..., 2]  # > 0 when below ground
    v_n = jnp.sum(velocities * n, axis=-1)
    # smooth activation over transition_eps avoids a hard discontinuity
    act = jnp.clip(depth / params.transition_eps, 0.0, 1.0)
    f_n = jnp.maximum(
        params.stiffness * depth - params.damping * v_n, 0.0
    ) * act
    v_t = velocities - v_n[..., None] * n
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    # regularized Coulomb: ratio → μ for vt >> v_transition, linear below
    scale = jnp.minimum(vt_norm / params.transition_velocity, 1.0)
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


def compute_contact_fext(
    tree: KinematicTree,
    xw: list[Transform],
    vel: list[jax.Array],
    ground,
    params: ContactParams,
) -> tuple[jax.Array, jax.Array]:
    """Full spring-damper pipeline: returns (fext (nb,6) local wrenches,
    forces_world (ncp,3) for telemetry/sensors)."""
    if tree.ncp == 0:
        return jnp.zeros((tree.nb, 6)), jnp.zeros((0, 3))
    pts, vels = contact_points_world(tree, xw, vel)
    f_w = spring_damper_forces(pts, vels, ground, params)
    return forces_to_fext(tree, xw, f_w, pts), f_w
