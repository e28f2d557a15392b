"""Acrobot swing-up env — parity target #2 (BASELINE.md config 2).

Reference: ``AcrobotJiminyEnv`` (SURVEY.md §2.5): torque on the elbow only,
reward -1 per step until the tip rises above one link-length over the pivot
(Gym classic-control parameterization)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.engine import Engine, EngineOptions, SimState
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.models import make_acrobot


class AcrobotEnv(BaseEnv):
    def __init__(
        self,
        torque_mag: float = 1.0,
        step_dt: float = 0.2,
        sim_dt: float = 0.02,
        max_steps: int = 500,
        continuous: bool = False,
    ):
        tree = make_acrobot()
        engine = Engine(
            tree,
            EngineOptions(dt=sim_dt, solver="runge_kutta_4", enable_bounds=False),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        super().__init__(engine, step_dt=step_dt, max_steps=max_steps)
        self.torque_mag = torque_mag
        self.continuous = continuous

    @property
    def termination_meaning(self) -> str:
        return "success"  # terminated == swing-up goal reached

    @property
    def action_size(self) -> int:
        return 1

    @property
    def discrete_actions(self) -> int | None:
        return None if self.continuous else 3

    def _sample_state(self, key):
        q = jax.random.uniform(key, (2,), minval=-0.1, maxval=0.1)
        v = jax.random.uniform(
            jax.random.fold_in(key, 1), (2,), minval=-0.1, maxval=0.1
        )
        return q, v

    def _action_to_command(self, action, sim: SimState):
        if self.continuous:
            t = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0) * self.torque_mag
        else:
            # {0, 1, 2} → {-τ, 0, +τ}
            a = jnp.clip(jnp.reshape(action, ()).astype(jnp.float32), 0.0, 2.0)
            t = (a - 1.0) * self.torque_mag
        return jnp.stack([jnp.zeros_like(t), t])

    def _observe(self, sim: SimState, rng):
        t1, t2 = sim.q[0], sim.q[1]
        return jnp.stack(
            [
                jnp.cos(t1),
                jnp.sin(t1),
                jnp.cos(t2),
                jnp.sin(t2),
                sim.v[0],
                sim.v[1],
            ]
        )

    def _tip_height(self, sim: SimState):
        # pivot at origin; links point down at q=0 (lengths 1, 1)
        t1, t2 = sim.q[0], sim.q[1]
        return -jnp.cos(t1) - jnp.cos(t1 + t2)

    def _reward(self, prev: EnvState, action, sim: SimState):
        return jnp.where(self._terminated(sim), 0.0, -1.0)

    def _terminated(self, sim: SimState, info=None):
        return self._tip_height(sim) > 1.0
