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
            """rgb_array frame: skeleton side view (matplotlib Agg) —
            headless-host stand-in for the reference's 3-D viewer."""
            import matplotlib

            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt

            from jiminy_tpu.core import algos

            tree = self._env.tree
            q = self._state.sim.q
            xw = algos.forward_kinematics(tree, q)
            pts = np.stack([np.asarray(x.pos) for x in xw])
            fig, ax = plt.subplots(figsize=(4, 4), dpi=80)
            for i in range(tree.nb):
                p = tree.parent[i]
                if p >= 0:
                    ax.plot(
                        [pts[p, 0], pts[i, 0]], [pts[p, 2], pts[i, 2]],
                        "-o", color="#3377cc", markersize=2, linewidth=1.5,
                    )
            ax.axhline(0.0, color="#888", linewidth=0.8)
            ax.set_aspect("equal")
            ax.set_xlim(pts[:, 0].mean() - 1.2, pts[:, 0].mean() + 1.2)
            ax.set_ylim(-0.2, 2.0)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
            plt.close(fig)
            return buf

    return _Adapter()
