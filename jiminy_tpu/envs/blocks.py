"""Observer/controller pipeline blocks.

Reference: gym_jiminy's block library — ``PDController`` (high-frequency
PD with target integration and effort limits), ``MotorSafetyLimit``,
``MahonyFilter`` (IMU attitude observer), ``DeformationEstimator``
(flexibility state from IMUs) (SURVEY.md §2.4 "Blocks").

A block is a pair of pure functions:
    init(key) → block_state
    apply(block_state, **inputs) → (block_state, output)
composed by :mod:`jiminy_tpu.envs.pipeline` into an env pipeline, all
inside one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.math import so3


class MahonyFilterState(struct.PyTreeNode):
    quat: jax.Array  # (4,) xyzw attitude estimate
    bias: jax.Array  # (3,) gyro bias estimate


class MahonyFilter:
    """Mahony complementary attitude filter on (gyro, accel).

    Reference: gym_jiminy's MahonyFilter observer block. kp/ki are the
    standard proportional/integral gains; ``dt`` is the block update
    period (its pipeline slot's period)."""

    def __init__(self, dt: float, kp: float = 1.0, ki: float = 0.1):
        self.dt, self.kp, self.ki = dt, kp, ki

    def init(self, key=None) -> MahonyFilterState:
        return MahonyFilterState(
            quat=so3.quat_identity(), bias=jnp.zeros(3)
        )

    def apply(
        self, state: MahonyFilterState, gyro: jax.Array, accel: jax.Array
    ) -> tuple[MahonyFilterState, jax.Array]:
        """One filter update; returns (state', quat estimate)."""
        # measured gravity direction (body frame): −accel normalized...
        # accelerometer at (near-)rest reads −g ⇒ +z when level
        a_norm = accel / jnp.maximum(jnp.linalg.norm(accel), 1e-6)
        # estimated gravity direction in body frame
        R = so3.quat_to_matrix(state.quat)
        v_hat = R.T @ jnp.array([0.0, 0.0, 1.0])
        e = jnp.cross(a_norm, v_hat)
        bias = state.bias - self.ki * e * self.dt
        w = gyro - bias + self.kp * e
        quat = so3.quat_integrate(state.quat, w, self.dt)
        return MahonyFilterState(quat=quat, bias=bias), quat


class PDControllerState(struct.PyTreeNode):
    target: jax.Array  # (nm,) integrated position target


class PDControllerBlock:
    """PD controller block with optional target integration: the action is
    either an absolute target position or a target VELOCITY integrated by
    the block (reference: PDController with ``order=1`` integration and
    effort limits)."""

    def __init__(
        self,
        motors,
        kp: float,
        kd: float,
        dt: float,
        integrate_velocity: bool = False,
        target_limits=None,  # (lo (nm,), hi (nm,))
    ):
        self.motors = motors
        self.kp, self.kd, self.dt = kp, kd, dt
        self.integrate_velocity = integrate_velocity
        self.target_limits = target_limits

    def init(self, key=None, q0=None) -> PDControllerState:
        nm = self.motors.nm
        if q0 is None:
            target = jnp.zeros(nm)
        else:
            target = q0[jnp.asarray(self.motors.q_idx, jnp.int32)]
        return PDControllerState(target=target)

    def apply(
        self, state: PDControllerState, action, qm, vm
    ) -> tuple[PDControllerState, jax.Array]:
        """(state, action, motor pos, motor vel) → (state', motor torque)."""
        if self.integrate_velocity:
            target = state.target + action * self.dt
        else:
            target = action
        if self.target_limits is not None:
            target = jnp.clip(target, self.target_limits[0], self.target_limits[1])
        u = self.kp * (target - qm) - self.kd * vm
        u = jnp.clip(u, -self.motors.effort_limit, self.motors.effort_limit)
        return PDControllerState(target=target), u


class MotorSafetyLimit:
    """Stateless command shaper: torque pushing a joint further toward a
    position limit fades to zero inside a soft margin, and a velocity
    damper engages near the velocity limit (reference: MotorSafetyLimit
    block)."""

    def __init__(self, motors, q_min, q_max, soft_margin: float = 0.1,
                 kd: float = 2.0):
        import numpy as np

        self.motors = motors
        qi = list(motors.q_idx)
        self.q_min = jnp.asarray(np.asarray(q_min)[qi])
        self.q_max = jnp.asarray(np.asarray(q_max)[qi])
        self.soft_margin = soft_margin
        self.kd = kd

    def init(self, key=None):
        return ()

    def apply(self, state, u, qm, vm):
        m = self.soft_margin
        # fade factor 0→1 across the margin from each limit
        up_room = jnp.clip((self.q_max - qm) / m, 0.0, 1.0)
        dn_room = jnp.clip((qm - self.q_min) / m, 0.0, 1.0)
        u = jnp.where(u > 0, u * up_room, u * dn_room)
        # active damping inside the margin
        braking = -self.kd * vm
        engage = jnp.maximum(1.0 - up_room, 1.0 - dn_room)
        return state, u + engage * braking


class DeformationEstimator:
    """Estimate a flexibility joint's deflection from two IMU quaternions
    bracketing it: deflection = log(q_parentᵀ ⊗ q_child ⊖ nominal)
    (reference: DeformationEstimator block reconstructing flexible state
    from IMUs)."""

    def __init__(self, nominal_rel_quat=None):
        self.nominal = nominal_rel_quat

    def init(self, key=None):
        return ()

    def apply(self, state, quat_parent, quat_child, quat_joint=None):
        """``quat_joint``: the KNOWN articulated rotation between the two
        IMU bodies (from encoders) when actuated joints sit between them
        — e.g. Cassie's hip flexibility: the chain is
        R_rel = R_flex · R_hip(θ_encoder), so R_flex = R_rel · R_hipᵀ."""
        rel = so3.quat_mul(so3.quat_conj(quat_parent), quat_child)
        if quat_joint is not None:
            rel = so3.quat_mul(rel, so3.quat_conj(quat_joint))
        if self.nominal is not None:
            rel = so3.quat_mul(so3.quat_conj(self.nominal), rel)
        return state, so3.quat_log(rel)
