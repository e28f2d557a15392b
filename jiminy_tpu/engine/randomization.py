"""Per-env model/inertial domain randomization.

Reference: jiminy's Model exposes randomization hooks over the dynamic
parameters (SURVEY.md §2.1 "Model": model randomization hooks) — the
standard sim-to-real axis: body masses, centers of mass, inertias, motor
armature, motor gains and friction, sensor calibration.

TPU-first design: a :class:`ModelParams` pytree of PER-ENV perturbations.
All leaves are arrays, so a ``vmap``-ed env batch carries batched values
while the compiled program stays single — exactly the per-env contact /
terrain randomization pattern (``Engine.step(contact_params=...)`` /
``info["ground"]``). The perturbed inertial constants are applied
functionally (``apply_to_tree`` returns a new KinematicTree pytree with
the same static topology), so nothing about the engine object mutates.

Kernel compatibility: a step with ``model_params`` rides the
RANDOMIZED whole-substep kernel variant — the perturbed inertial/motor
constants are packed per env into one traced lane input
(Engine._pack_model_params → ops/substep_kernel._unpack_mp) instead of
being baked, so domain-randomized training keeps fused-kernel speed
(round 4 measured the XLA fallback at 21× slower end-to-end; round 5
removed it). The XLA path remains for configs with no kernel in scope.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct


def _outer_shift(m: jax.Array, c: jax.Array) -> jax.Array:
    """(nb,) masses + (nb, 3) offsets → (nb, 3, 3) parallel-axis term
    m·(cᵀc·E − c cᵀ) relating origin inertia to central inertia."""
    E = jnp.eye(3, dtype=c.dtype)
    cc = jnp.sum(c * c, axis=-1)[:, None, None]
    return m[:, None, None] * (cc * E - c[:, :, None] * c[:, None, :])


class ModelParams(struct.PyTreeNode):
    """Perturbations of one env's dynamic model. Every field is a pytree
    leaf; batch them with vmap for per-env randomization.

    - ``mass_scale`` (nb,): multiplies each body mass (density scaling —
      the central inertia scales along via ``inertia_scale`` only).
    - ``com_offset`` (nb, 3): shifts each body's center of mass [m]; the
      origin-frame inertia follows by the parallel-axis theorem, so the
      perturbed body stays physically consistent.
    - ``inertia_scale`` (nb,): multiplies the CENTRAL inertia (on top of
      the mass scale).
    - ``armature_scale`` (nv,): multiplies rotor inertia.
    - ``motor_gain`` (nm,): multiplies the motor torque gain (reduction).
    - ``motor_friction_scale`` (nm,): multiplies dry + viscous friction.
    """

    mass_scale: jax.Array
    com_offset: jax.Array
    inertia_scale: jax.Array
    armature_scale: jax.Array
    motor_gain: jax.Array
    motor_friction_scale: jax.Array

    @staticmethod
    def nominal(tree, motors=None) -> "ModelParams":
        nm = motors.nm if motors is not None else 0
        return ModelParams(
            mass_scale=jnp.ones(tree.nb),
            com_offset=jnp.zeros((tree.nb, 3)),
            inertia_scale=jnp.ones(tree.nb),
            armature_scale=jnp.ones(tree.nv),
            motor_gain=jnp.ones(nm),
            motor_friction_scale=jnp.ones(nm),
        )

    def apply_to_tree(self, tree):
        """Pure: KinematicTree → KinematicTree with perturbed inertial
        leaves (topology static fields unchanged — vmap-safe)."""
        m = tree.inertia_mass
        dtype = m.dtype
        safe_m = jnp.where(m > 0, m, 1.0).astype(dtype)
        c = tree.inertia_h / safe_m[:, None]
        # central inertia from the origin-frame one
        I_c = tree.inertia_mat - _outer_shift(m, c)
        s = self.mass_scale.astype(dtype)
        m2 = s * m
        c2 = c + self.com_offset.astype(dtype)
        I_c2 = (self.inertia_scale.astype(dtype) * s)[:, None, None] * I_c
        I_o2 = I_c2 + _outer_shift(m2, c2)
        h2 = m2[:, None] * c2
        # massless connector bodies stay exactly untouched
        keep = (m > 0)[:, None]
        return tree.replace(
            inertia_mass=jnp.where(m > 0, m2, m),
            inertia_h=jnp.where(keep, h2, tree.inertia_h),
            inertia_mat=jnp.where(keep[:, :, None], I_o2, tree.inertia_mat),
            armature=tree.armature * self.armature_scale.astype(dtype),
        )

    def apply_to_motors(self, motors):
        if motors is None:
            return None
        return motors.replace(
            reduction=motors.reduction * self.motor_gain,
            friction_dry=motors.friction_dry * self.motor_friction_scale,
            friction_viscous=(
                motors.friction_viscous * self.motor_friction_scale
            ),
        )


@dataclasses.dataclass(frozen=True)
class ModelRandomization:
    """Sampling ranges for :class:`ModelParams` (uniform per episode).

    ``(lo, hi)`` multiplicative ranges; ``com_offset`` is an absolute
    ± bound in meters per axis. ``sensor_bias`` adds a per-episode
    constant offset (± bound) to every sensor channel (calibration
    error), sampled by :meth:`sample_sensor_bias` and consumed by
    ``SensorSuite.update(..., bias_extra=...)``."""

    mass_scale: tuple = (0.9, 1.1)
    com_offset: float = 0.01
    inertia_scale: tuple = (0.9, 1.1)
    armature_scale: tuple = (1.0, 1.0)
    motor_gain: tuple = (0.95, 1.05)
    motor_friction_scale: tuple = (1.0, 1.0)
    sensor_bias: float = 0.0

    def sample(self, key, tree, motors=None) -> ModelParams:
        nm = motors.nm if motors is not None else 0
        ks = jax.random.split(key, 6)

        def u(k, shape, rng):
            return jax.random.uniform(
                k, shape, minval=rng[0], maxval=rng[1]
            )

        return ModelParams(
            mass_scale=u(ks[0], (tree.nb,), self.mass_scale),
            com_offset=u(
                ks[1], (tree.nb, 3), (-self.com_offset, self.com_offset)
            ),
            inertia_scale=u(ks[2], (tree.nb,), self.inertia_scale),
            armature_scale=u(ks[3], (tree.nv,), self.armature_scale),
            motor_gain=u(ks[4], (nm,), self.motor_gain),
            motor_friction_scale=u(
                ks[5], (nm,), self.motor_friction_scale
            ),
        )

    def sample_sensor_bias(self, key, suite) -> tuple:
        """Per-episode additive bias offsets, one (ns, dim) array per
        sensor group (same layout as ``group.bias``)."""
        offs = []
        for g in suite.groups:
            key, k = jax.random.split(key)
            offs.append(
                jax.random.uniform(
                    k, g.bias.shape,
                    minval=-self.sensor_bias, maxval=self.sensor_bias,
                )
            )
        return tuple(offs)
