"""Gymnasium adapter: wraps a functional BaseEnv as a standard
``gymnasium.Env`` for interactive single-env use and ecosystem compat.

Reference: the reference's L4 env IS a gym.Env (SURVEY.md §2.4); here the
gym interface is a thin shell over the jitted functional core, so the same
compiled step serves both interactive and batched training paths."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _HAS_GYM = True
except ImportError:  # pragma: no cover
    _HAS_GYM = False

from jiminy_tpu.envs.base import BaseEnv


def make_gym_env(env: BaseEnv, seed: int = 0):
    """Build a gymnasium.Env around a functional env."""
    if not _HAS_GYM:
        raise ImportError("gymnasium is not available")

    class _Adapter(gymnasium.Env):
        metadata = {"render_modes": ["rgb_array"]}
        render_mode = "rgb_array"

        def __init__(self):
            self._env = env
            self._jit_reset = jax.jit(env.reset)
            self._jit_step = jax.jit(env.step_no_reset)
            self._state = None
            self._key = jax.random.PRNGKey(seed)
            n_disc = env.discrete_actions
            if n_disc is not None:
                self.action_space = spaces.Discrete(n_disc)
            else:
                self.action_space = spaces.Box(
                    low=-1.0, high=1.0, shape=(env.action_size,), dtype=np.float32
                )
            obs_size = env.observation_size
            self.observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(obs_size,), dtype=np.float32
            )

        def reset(self, *, seed=None, options=None):
            if seed is not None:
                self._key = jax.random.PRNGKey(seed)
            self._key, k = jax.random.split(self._key)
            self._state = self._jit_reset(k)
            return np.asarray(self._state.obs), {}

        def step(self, action):
            a = jnp.asarray(action)
            self._state = self._jit_step(self._state, a)
            s = self._state
            return (
                np.asarray(s.obs),
                float(s.reward),
                bool(s.terminated),
                bool(s.truncated),
                {},
            )

        def render(self):
            """rgb_array frame: shaded 3-D render of the current state
            (viewer3d painter; reference: Viewer.capture_frame), with
            the env's terrain in the scene."""
            from jiminy_tpu.viewer3d import render_frame3d

            env = self._env
            robot = getattr(env, "robot", None) or env.tree
            ground = (
                self._state.info.get("ground")
                or getattr(getattr(env, "engine", None), "ground", None)
            )
            return render_frame3d(
                robot, np.asarray(self._state.sim.q), size=400,
                ground=ground,
            )

    return _Adapter()
