"""CartPole env — parity target #1 (BASELINE.md config 1).

Reference: ``CartPoleJiminyEnv`` (SURVEY.md §2.5): discrete ±force actions,
classic Gym termination (|x| > 2.4 m, |θ| > 12°), reward 1 per step."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.engine import Engine, EngineOptions, SimState
from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.models import make_cartpole


class CartPoleEnv(BaseEnv):
    THETA_LIMIT = 12.0 * jnp.pi / 180.0
    X_LIMIT = 2.4

    def __init__(
        self,
        force_mag: float = 10.0,
        step_dt: float = 0.02,
        sim_dt: float = 0.002,
        max_steps: int = 500,
        continuous: bool = False,
    ):
        tree = make_cartpole(x_limit=4.8)  # bounds beyond termination box
        engine = Engine(
            tree, EngineOptions(dt=sim_dt, enable_bounds=False)
        )
        super().__init__(engine, step_dt=step_dt, max_steps=max_steps)
        self.force_mag = force_mag
        self.continuous = continuous

    @property
    def action_size(self) -> int:
        return 1

    @property
    def discrete_actions(self) -> int | None:
        return None if self.continuous else 2

    def _sample_state(self, key):
        q = jax.random.uniform(key, (2,), minval=-0.05, maxval=0.05)
        v = jax.random.uniform(
            jax.random.fold_in(key, 1), (2,), minval=-0.05, maxval=0.05
        )
        return q, v

    def _action_to_command(self, action, sim: SimState):
        if self.continuous:
            f = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0) * self.force_mag
        else:
            a = jnp.clip(jnp.reshape(action, ()).astype(jnp.float32), 0.0, 1.0)
            f = (2.0 * a - 1.0) * self.force_mag
        return jnp.stack([f, jnp.zeros_like(f)])

    def _observe(self, sim: SimState, rng):
        return jnp.stack([sim.q[0], sim.v[0], sim.q[1], sim.v[1]])

    def _reward(self, prev: EnvState, action, sim: SimState):
        return jnp.float32(1.0)

    def _terminated(self, sim: SimState, info=None):
        return (jnp.abs(sim.q[0]) > self.X_LIMIT) | (
            jnp.abs(sim.q[1]) > self.THETA_LIMIT
        )
