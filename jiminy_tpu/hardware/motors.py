"""Motor models: command → joint effort.

Reference: jiminy's ``AbstractMotorBase`` / ``SimpleMotor`` — mechanical
reduction, effort & velocity limits, dry + viscous friction, armature
(rotor inertia) (SURVEY.md §2.1 "Motors"). Armature lives on the
KinematicTree (added to the mass-matrix diagonal by the rigid-body
algorithms); everything else is computed here.

TPU-first: one stacked computation over all motors, vmap-able; the motor →
velocity-dof mapping is a static gather/scatter fixed at build time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _static(default=None):
    return struct.field(pytree_node=False, default=default)


class Motors(struct.PyTreeNode):
    """Stacked motor bank attached to 1-DoF joints.

    ``command`` semantics follow the reference's SimpleMotor: the command is
    a motor-side torque, clamped to ``effort_limit``; the joint-side torque
    is ``reduction ×`` that, minus dry + viscous friction evaluated at the
    motor velocity (= reduction × joint velocity). When the joint speed
    exceeds ``velocity_limit`` the torque pushing further in that direction
    ramps to zero (reference: enableVelocityLimit behavior)."""

    # static topology
    v_idx: tuple = _static(())  # (nm,) velocity-dof index per motor
    q_idx: tuple = _static(())  # (nm,) position index per motor (1-DoF joints)
    name: tuple = _static(())

    # (nm,) parameters — pytree leaves, may be randomized per env
    reduction: jax.Array = None
    effort_limit: jax.Array = None  # motor-side torque limit
    velocity_limit: jax.Array = None  # joint-side velocity limit
    friction_dry: jax.Array = None  # joint-side dry friction torque
    friction_viscous: jax.Array = None  # joint-side viscous coefficient
    friction_vel_eps: jax.Array = None  # dry-friction smoothing velocity

    @property
    def nm(self) -> int:
        return len(self.v_idx)

    @staticmethod
    def create(
        v_idx,
        q_idx=None,
        names=None,
        reduction=1.0,
        effort_limit=1e6,
        velocity_limit=1e6,
        friction_dry=0.0,
        friction_viscous=0.0,
        friction_vel_eps=1e-2,
    ) -> "Motors":
        nm = len(v_idx)

        def arr(x):
            return jnp.asarray(np.broadcast_to(np.asarray(x, np.float32), (nm,)))

        return Motors(
            v_idx=tuple(int(i) for i in v_idx),
            q_idx=tuple(int(i) for i in (q_idx if q_idx is not None else v_idx)),
            name=tuple(names) if names else tuple(f"motor_{i}" for i in v_idx),
            reduction=arr(reduction),
            effort_limit=arr(effort_limit),
            velocity_limit=arr(velocity_limit),
            friction_dry=arr(friction_dry),
            friction_viscous=arr(friction_viscous),
            friction_vel_eps=arr(friction_vel_eps),
        )

    def _is_contiguous(self, idx: tuple) -> bool:
        return bool(idx) and list(idx) == list(
            range(idx[0], idx[0] + len(idx))
        )

    def _gather(self, x: jax.Array, idx: tuple) -> jax.Array:
        """Static-index gather: contiguous slice when possible, per-element
        otherwise (index-array gathers are miscompiled by the current TPU
        backend — see engine/solver.py)."""
        if self._is_contiguous(idx):
            return x[idx[0] : idx[0] + len(idx)]
        return jnp.stack([x[i] for i in idx])

    def _scatter_add(self, x: jax.Array, idx: tuple, vals) -> jax.Array:
        if self._is_contiguous(idx):
            return x.at[idx[0] : idx[0] + len(idx)].add(vals)
        for k, i in enumerate(idx):
            x = x.at[i].add(vals[k])
        return x

    def compute_effort(self, command: jax.Array, v: jax.Array) -> jax.Array:
        """(nm,) motor command + (nv,) joint velocities → (nv,) joint torque.

        Pure; called inside the engine substep (reference call stack
        SURVEY.md §3.1: "motor model: command → joint efforts")."""
        v_j = self._gather(v, self.v_idx)
        u = jnp.clip(command, -self.effort_limit, self.effort_limit)
        tau_m = self.reduction * u
        # velocity limit: derate torque that pushes past the limit
        over = jnp.clip(
            (jnp.abs(v_j) - self.velocity_limit)
            / (0.1 * jnp.maximum(self.velocity_limit, 1e-6)),
            0.0,
            1.0,
        )
        same_dir = jnp.sign(tau_m) == jnp.sign(v_j)
        tau_m = jnp.where(same_dir, tau_m * (1.0 - over), tau_m)
        # friction at the joint level (dry smoothed by tanh, + viscous)
        fric = self.friction_dry * jnp.tanh(
            v_j / self.friction_vel_eps
        ) + self.friction_viscous * v_j
        return self._scatter_add(jnp.zeros_like(v), self.v_idx, tau_m - fric)

    def command_from_joint(self, tau_joint: jax.Array) -> jax.Array:
        """Inverse map for controllers that think joint-side: (nm,) joint
        torques → motor commands (divide by reduction)."""
        return tau_joint / self.reduction

    def joint_state(self, q: jax.Array, v: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Motor-ordered joint positions and velocities (nm,), (nm,) — the
        state a PD controller closes on (reference: EncoderSensor data used
        by the PDController block, SURVEY.md §2.4 "Blocks")."""
        return self._gather(q, self.q_idx), self._gather(v, self.v_idx)
