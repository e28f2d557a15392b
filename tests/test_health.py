"""Numerical-health harness (utils/health.py): the sanitizer analog.

Pins: state_flags classify NaN/explosion states; BaseEnv's nan_guard
terminates + sanitizes a poisoned env so auto-reset recovers it;
checkify_fn surfaces WHICH check failed; debug_nans raises at the
producing op (SURVEY.md §5 "Sanitizer analog"; VERDICT r1 weak #7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.utils import health


def _cartpole():
    from jiminy_tpu.envs import CartPoleEnv

    return CartPoleEnv()


def _poison(state, value=jnp.nan):
    v = state.sim.v.at[0].set(value)
    return state.replace(sim=state.sim.replace(v=v))


class TestStateFlags:
    def test_healthy_state_is_clean(self):
        env = _cartpole()
        st = env.reset(jax.random.PRNGKey(0))
        assert int(health.state_flags(st.sim)) == 0
        assert not bool(health.is_bad_state(st.sim))

    def test_nan_and_explosion_flags(self):
        env = _cartpole()
        st = env.reset(jax.random.PRNGKey(0))
        bad = _poison(st)
        assert int(health.state_flags(bad.sim)) & health.NONFINITE_V
        huge = _poison(st, 1e7)
        assert int(health.state_flags(huge.sim)) == health.VEL_EXPLOSION
        nan_q = st.replace(
            sim=st.sim.replace(q=st.sim.q.at[0].set(jnp.inf))
        )
        assert int(health.state_flags(nan_q.sim)) & health.NONFINITE_Q


class TestNanGuard:
    def test_poisoned_env_terminates_and_sanitizes(self):
        """A NaN state must terminate the episode with finite obs/reward
        — not silently propagate through auto-reset."""
        env = _cartpole()
        st = _poison(env.reset(jax.random.PRNGKey(0)))
        nxt = jax.jit(env.step)(st, jnp.zeros(env.action_size))
        assert bool(nxt.terminated)
        assert float(nxt.reward) == 0.0
        # auto-reset replaced the state with a fresh finite episode
        assert bool(jnp.all(jnp.isfinite(nxt.sim.q)))
        assert bool(jnp.all(jnp.isfinite(nxt.sim.v)))
        assert bool(jnp.all(jnp.isfinite(nxt.obs)))
        # final_obs (the bootstrap target) is finite too
        assert bool(jnp.all(jnp.isfinite(nxt.info["final_obs"])))

    def test_batch_survives_one_poisoned_env(self):
        env = _cartpole()
        B = 4
        sts = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
        sts = sts.replace(
            sim=sts.sim.replace(
                v=sts.sim.v.at[2, 0].set(jnp.nan)
            )
        )
        step = jax.jit(jax.vmap(env.step))
        out = sts
        for _ in range(3):
            out = step(out, jnp.zeros((B, env.action_size)))
        assert bool(jnp.all(jnp.isfinite(out.obs)))
        assert bool(jnp.all(jnp.isfinite(out.sim.q)))

    def test_guard_can_be_disabled(self):
        env = _cartpole()
        env.nan_guard = False
        st = _poison(env.reset(jax.random.PRNGKey(0)))
        nxt = env.step_no_reset(st, jnp.zeros(env.action_size))
        # without the guard the NaN propagates (documenting the hazard)
        assert not bool(jnp.all(jnp.isfinite(nxt.sim.v)))


class TestCheckify:
    def test_checkify_names_the_failed_check(self):
        env = _cartpole()
        st = env.reset(jax.random.PRNGKey(0))
        checked = jax.jit(
            health.checkify_fn(
                lambda s, a: env.step_no_reset(s, a).sim
            )
        )
        err, _ = checked(st, jnp.zeros(env.action_size))
        err.throw()  # healthy: no-op
        err, _ = checked(_poison(st), jnp.zeros(env.action_size))
        with pytest.raises(Exception, match="non-finite"):
            err.throw()

    def test_checkify_velocity_explosion(self):
        env = _cartpole()
        st = _poison(env.reset(jax.random.PRNGKey(0)), 1e7)
        checked = jax.jit(
            health.checkify_fn(lambda s: s.sim, vel_limit=1e4)
        )
        err, _ = checked(st)
        with pytest.raises(Exception, match="explosion"):
            err.throw()


class TestDebugNans:
    def test_debug_nans_raises_at_op(self):
        with health.debug_nans():
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: x / x)(jnp.float32(0.0)).block_until_ready()
        # restored afterwards
        assert not jax.config.jax_debug_nans
        out = jax.jit(lambda x: x / x)(jnp.float32(0.0))
        assert bool(jnp.isnan(out))
