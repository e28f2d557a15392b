"""Reward & termination compositions over quantities.

Reference: gym_jiminy's declarative compositions — radial-basis tracking
rewards over quantities, additive/multiplicative mixtures, survival
reward; quantity-bound terminations, mechanical-safety terminations
(SURVEY.md §2.4 "Compositions").

Everything is a pure function of a :class:`QuantityContext` (+ action),
so compositions assemble at env-build time and compile into the step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from jiminy_tpu.envs.quantities import QuantityContext

# reward/termination signature: (ctx, action) → scalar / bool
RewardFn = Callable[[QuantityContext, jax.Array], jax.Array]
TerminationFn = Callable[[QuantityContext], jax.Array]

CUTOFF_ESP = 1e-2  # radial-basis value at the cutoff (reference constant)


def radial_basis(err2: jax.Array, cutoff: float) -> jax.Array:
    """exp(−‖err‖²·ln(1/ε)/cutoff²): 1 at zero error, ε at the cutoff —
    the reference's tracking-reward kernel."""
    return jnp.exp(-err2 * (jnp.log(1.0 / CUTOFF_ESP) / (cutoff * cutoff)))


def tracking_reward(
    quantity: Callable[[QuantityContext], jax.Array],
    target,
    cutoff: float,
) -> RewardFn:
    """Radial-basis tracking of a quantity toward ``target`` (array or
    fn(ctx) → array). Reference: TrackingQuantityReward."""

    def fn(ctx: QuantityContext, action) -> jax.Array:
        val = quantity(ctx)
        tgt = target(ctx) if callable(target) else jnp.asarray(target)
        err = jnp.ravel(val - tgt)
        return radial_basis(jnp.sum(err * err), cutoff)

    return fn


def quantity_reward(
    quantity: Callable[[QuantityContext], jax.Array],
) -> RewardFn:
    """Raw quantity as a reward term (reference: QuantityReward) — the
    generic escape hatch for shaping terms that aren't trackers, e.g.
    uprightness = ``ctx.base_tilt`` or a lateral-slip penalty; weight it
    inside :func:`additive_mixture`."""
    return lambda ctx, action: quantity(ctx)


def survival_reward(value: float = 1.0) -> RewardFn:
    """Constant alive bonus (reference: SurvivalReward)."""
    return lambda ctx, action: jnp.float32(value)


def action_penalty(weight: float = 1.0) -> RewardFn:
    """−w·‖action‖² control regularizer."""
    return lambda ctx, action: -weight * jnp.sum(jnp.square(action))


def additive_mixture(
    parts: Sequence[tuple[float, RewardFn]],
) -> RewardFn:
    """Σ wᵢ·rᵢ (reference: AdditiveMixtureReward)."""

    def fn(ctx, action):
        total = jnp.float32(0.0)
        for w, r in parts:
            total = total + w * r(ctx, action)
        return total

    return fn


def multiplicative_mixture(parts: Sequence[RewardFn]) -> RewardFn:
    """Π rᵢ (reference: MultiplicativeMixtureReward) — gates tracking
    terms by safety terms."""

    def fn(ctx, action):
        total = jnp.float32(1.0)
        for r in parts:
            total = total * r(ctx, action)
        return total

    return fn


# ---- terminations -------------------------------------------------------


def quantity_termination(
    quantity: Callable[[QuantityContext], jax.Array],
    low=None,
    high=None,
) -> TerminationFn:
    """Terminate when a quantity leaves [low, high] on any component
    (reference: QuantityTermination)."""

    def fn(ctx) -> jax.Array:
        val = jnp.ravel(quantity(ctx))
        bad = jnp.zeros((), bool)
        if low is not None:
            bad = bad | jnp.any(val < low)
        if high is not None:
            bad = bad | jnp.any(val > high)
        return bad

    return fn


def base_height_termination(min_height: float) -> TerminationFn:
    """Terminate when the base drops below ``min_height`` above the LOCAL
    ground (terrain-aware when the context carries a ground)."""
    return quantity_termination(
        lambda ctx: ctx.base_height_above_ground, low=min_height
    )


def base_tilt_termination(max_tilt_cos: float = 0.6) -> TerminationFn:
    """Terminate when the base tilts past arccos(max_tilt_cos) — the
    reference's base roll/pitch safety termination."""
    return quantity_termination(lambda ctx: ctx.base_tilt, low=max_tilt_cos)


def drift_termination(max_drift: float) -> TerminationFn:
    """Terminate when planar odometry drifts beyond ``max_drift`` m from
    the origin (reference: drift termination)."""
    return quantity_termination(
        lambda ctx: jnp.linalg.norm(ctx.odometry[:2]), high=max_drift
    )


def flying_termination(max_flight_z: float) -> TerminationFn:
    """Terminate when all contacts unload and the base exceeds a height —
    the reference's "flying" safety check."""

    def fn(ctx):
        airborne = ctx.total_contact_force[2] < 1e-3
        return airborne & (ctx.sim.q[2] > max_flight_z)

    return fn


def mechanical_safety_termination(
    tree, q_margin: float = 0.0, v_limit_scale: float = 1.0
) -> TerminationFn:
    """Terminate on joint position/velocity limit violation
    (reference: mechanical safety termination)."""
    import numpy as np

    q_min = jnp.asarray(np.asarray(tree.q_min))
    q_max = jnp.asarray(np.asarray(tree.q_max))
    v_max = jnp.asarray(np.asarray(tree.v_max))

    def fn(ctx):
        q, v = ctx.sim.q, ctx.sim.v
        bad_q = jnp.any((q < q_min - q_margin) | (q > q_max + q_margin))
        bad_v = jnp.any(jnp.abs(v) > v_limit_scale * v_max)
        return bad_q | bad_v

    return fn


def any_termination(parts: Sequence[TerminationFn]) -> TerminationFn:
    """OR-composition of terminations."""

    def fn(ctx):
        bad = jnp.zeros((), bool)
        for p in parts:
            bad = bad | p(ctx)
        return bad

    return fn
