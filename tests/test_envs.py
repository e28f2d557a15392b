"""Env-layer tests: functional API, auto-reset, batching, gym adapter
(reference gym-layer test strategy, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.envs import AcrobotEnv, CartPoleEnv


def test_cartpole_reset_step():
    env = CartPoleEnv()
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (4,)
    state2 = jax.jit(env.step)(state, jnp.int32(1))
    assert float(state2.reward) == 1.0
    assert not bool(state2.terminated)
    # pushing right accelerates the cart right
    assert float(state2.sim.v[0]) > float(state.sim.v[0])


def test_cartpole_eventually_falls():
    """Constant one-sided pushes topple the pole within 500 steps."""
    env = CartPoleEnv()
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))

    @jax.jit
    def run(state):
        actions = jnp.ones(200, dtype=jnp.int32)
        _, traj = env.rollout(state, actions)
        return traj

    traj = run(state)
    assert bool(traj["terminated"].any())


def test_auto_reset_restarts_episode():
    env = CartPoleEnv(max_steps=5)
    state = jax.jit(env.reset)(jax.random.PRNGKey(2))

    @jax.jit
    def run(state):
        actions = jnp.ones(12, dtype=jnp.int32)
        final, traj = env.rollout(state, actions)
        return final, traj

    final, traj = run(state)
    # truncation fires at steps 5 and 10
    assert bool(traj["truncated"][4]) and bool(traj["truncated"][9])
    # after truncation the state was auto-reset: step counter restarted
    assert int(final.steps) == 2
    # the auto-reset state is near the origin again
    assert abs(float(final.sim.q[1])) < 0.2


def test_batched_rollout_throughput_shape():
    env = CartPoleEnv()
    B, T = 32, 50
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.jit(jax.vmap(env.reset))(keys)

    @jax.jit
    def run(states):
        def body(st, _):
            a = jax.random.bernoulli(st.rng[0], 0.5, (B,)).astype(jnp.int32)
            st = jax.vmap(env.step)(st, a)
            return st, st.reward

        return jax.lax.scan(body, states, None, length=T)

    final, rewards = run(states)
    assert rewards.shape == (T, B)
    assert final.obs.shape == (B, 4)


def test_acrobot_hanging_is_stable():
    """At rest hanging down with zero torque, the acrobot stays down."""
    env = AcrobotEnv()
    state = jax.jit(env.reset)(jax.random.PRNGKey(4))

    @jax.jit
    def run(state):
        actions = jnp.ones(20, dtype=jnp.int32)  # action 1 = zero torque
        final, traj = env.rollout(state, actions)
        return final, traj

    final, traj = run(state)
    assert not bool(traj["terminated"].any())
    # tip stays low
    t1, t2 = float(final.sim.q[0]), float(final.sim.q[1])
    assert -np.cos(t1) - np.cos(t1 + t2) < 0.0


def test_acrobot_torque_moves_elbow():
    env = AcrobotEnv()
    state = jax.jit(env.reset)(jax.random.PRNGKey(5))
    s_pos = jax.jit(env.step)(state, jnp.int32(2))
    s_neg = jax.jit(env.step)(state, jnp.int32(0))
    assert float(s_pos.sim.v[1]) > float(s_neg.sim.v[1])


def test_gym_adapter_cartpole():
    from jiminy_tpu.envs.gym_adapter import make_gym_env

    genv = make_gym_env(CartPoleEnv(), seed=7)
    obs, info = genv.reset(seed=42)
    assert obs.shape == (4,)
    total = 0.0
    for _ in range(10):
        obs, r, term, trunc, _ = genv.step(genv.action_space.sample())
        total += r
        if term or trunc:
            break
    assert total >= 1.0


def test_determinism_same_seed():
    """Identical seeds ⇒ identical trajectories (reference determinism
    backbone, SURVEY.md §3.3/§4)."""
    env = CartPoleEnv()

    @jax.jit
    def run(key):
        state = env.reset(key)
        actions = jnp.array([1, 0, 1, 1, 0, 1, 0, 0, 1, 1], dtype=jnp.int32)
        final, traj = env.rollout(state, actions)
        return traj["obs"]

    o1 = run(jax.random.PRNGKey(9))
    o2 = run(jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = run(jax.random.PRNGKey(10))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0
