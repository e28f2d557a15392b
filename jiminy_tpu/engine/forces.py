"""External force registry: impulses, profiles, viscoelastic couplings.

Reference: jiminy's Engine external forces — ``registerImpulseForce``
(force on a frame over [t, t+dt]), ``registerProfileForce`` (force from a
time callback) and force *couplings* (viscoelastic spring-damper between
two frames, possibly of different robots) (SURVEY.md §2.1 "Engine",
§3.1 "force-impulse boundaries").

TPU-first: forces are pure structures evaluated inside the jitted substep;
impulse windows are ``where`` masks on the simulation clock (no breakpoint
re-stepping needed — the fixed-step grid resolves the window), and
couplings work across robots because multi-robot simulation is one merged
forest tree (core.tree.merge_trees).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree
from jiminy_tpu.math import so3


def _static(default=None):
    return struct.field(pytree_node=False, default=default)


class ImpulseForce(struct.PyTreeNode):
    """World-frame force applied at a frame during [t_start, t_start+dt]
    (reference: registerImpulseForce)."""

    frame: int = _static()
    t_start: jax.Array = None  # ()
    duration: jax.Array = None  # ()
    force: jax.Array = None  # (3,) world force (or (6,) [torque; force])

    def wrench_world(self, t, pos):
        active = (t >= self.t_start) & (t < self.t_start + self.duration)
        f = jnp.where(active, 1.0, 0.0) * self.force
        if f.shape[-1] == 3:
            return jnp.zeros(3, dtype=f.dtype), f
        return f[:3], f[3:]


class ProfileForce(struct.PyTreeNode):
    """Force from a time callback f(t) → (3,) or (6,) world wrench at a
    frame (reference: registerProfileForce). The callback is traced into
    the program — any jax-expressible profile works."""

    frame: int = _static()
    fn: Callable = _static()

    def wrench_world(self, t, pos):
        f = jnp.asarray(self.fn(t))
        if f.shape[-1] == 3:
            return jnp.zeros(3, dtype=f.dtype), f
        return f[:3], f[3:]


class CouplingForce(struct.PyTreeNode):
    """Viscoelastic 6-D spring-damper between two frames (reference:
    registerViscoelasticForceCoupling — the multi-robot coupling path).
    Linear: f = k_lin·(p2−p1) + c_lin·(v2−v1) pulls the frames together;
    angular: τ = k_ang·log(R1ᵀR2) + c_ang·(ω2−ω1)."""

    frame1: int = _static()
    frame2: int = _static()
    k_lin: jax.Array = None  # () or (3,)
    c_lin: jax.Array = None
    k_ang: jax.Array = None
    c_ang: jax.Array = None

    @staticmethod
    def create(frame1, frame2, k_lin=0.0, c_lin=0.0, k_ang=0.0, c_ang=0.0):
        return CouplingForce(
            frame1=frame1,
            frame2=frame2,
            k_lin=jnp.float32(k_lin),
            c_lin=jnp.float32(c_lin),
            k_ang=jnp.float32(k_ang),
            c_ang=jnp.float32(c_ang),
        )


def _frame_state(tree, xw, vel, f):
    b = tree.frame_body[f]
    pose = xw[b].compose(tree.frame_placement(f))
    w_l, v_l = vel[b][:3], vel[b][3:]
    p = tree.fp_pos[f]
    v_w = xw[b].rot @ (v_l + jnp.cross(w_l, p))
    w_w = xw[b].rot @ w_l
    return b, pose, v_w, w_w


def _accumulate(tree, xw, fext, body, p_w, torque_w, force_w):
    """Add a world wrench at point p_w to body's local fext."""
    r = p_w - xw[body].pos
    n_w = torque_w + jnp.cross(r, force_w)
    Rt = xw[body].rot.T
    return fext.at[body].add(jnp.concatenate([Rt @ n_w, Rt @ force_w]))


def compute_forces(
    tree: KinematicTree,
    forces,
    t: jax.Array,
    xw,
    vel,
    dtype,
) -> jax.Array:
    """Evaluate all registered forces → (nb, 6) local spatial wrenches."""
    fext = jnp.zeros((tree.nb, 6), dtype=dtype)
    for frc in forces:
        if isinstance(frc, CouplingForce):
            b1, pose1, v1, w1 = _frame_state(tree, xw, vel, frc.frame1)
            b2, pose2, v2, w2 = _frame_state(tree, xw, vel, frc.frame2)
            f = frc.k_lin * (pose2.pos - pose1.pos) + frc.c_lin * (v2 - v1)
            tau = frc.k_ang * so3.log_matrix(
                pose1.rot.T @ pose2.rot
            ) + frc.c_ang * (w2 - w1)
            tau_w = pose1.rot @ tau
            fext = _accumulate(tree, xw, fext, b1, pose1.pos, tau_w, f)
            fext = _accumulate(tree, xw, fext, b2, pose2.pos, -tau_w, -f)
        else:
            b = tree.frame_body[frc.frame]
            pose = xw[b].compose(tree.frame_placement(frc.frame))
            torque_w, force_w = frc.wrench_world(t, pose.pos)
            fext = _accumulate(tree, xw, fext, b, pose.pos, torque_w, force_w)
    return fext
