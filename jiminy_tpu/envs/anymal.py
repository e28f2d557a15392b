"""ANYmal quadruped locomotion env — the flagship benchmark environment.

Reference: ``ANYmalJiminyEnv`` / ``ANYmalPDControlJiminyEnv`` — quadruped
locomotion with ground contacts, IMU/encoder sensors and a PD controller
pipeline block (SURVEY.md §2.5; BASELINE.json config #3: batch 4096,
≥1M env-steps/s on one TPU host).

Structure (TPU-first): the PD inner loop runs *inside* the engine at the
integration rate (the reference's high-frequency controller block), the
policy action is the PD setpoint offset at ``step_dt``. Everything —
dynamics, PGS contacts, PD, reward, termination, auto-reset — compiles
into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.engine import Engine, EngineOptions, SimState
from jiminy_tpu.envs.base import BaseEnv
from jiminy_tpu.math import so3
from jiminy_tpu.models.quadruped import make_anymal, stand_q


class ANYmalEnv(BaseEnv):
    """Velocity-tracking quadruped locomotion.

    Action: (12,) PD target offsets around the stand pose, in [-1, 1]
    (scaled by ``action_scale`` rad).
    Observation (33,): gravity direction in base frame (3), base angular
    velocity (3), base linear velocity (3) [all base-local], motor
    positions rel. stand (12), scaled motor velocities (12).
    Reward: forward-velocity tracking + uprightness − control/velocity
    penalties (the reference composes these from quantity-based rewards,
    SURVEY.md §2.4 "Compositions").
    """

    def __init__(
        self,
        step_dt: float = 0.02,
        sim_dt: float = 2.5e-3,
        max_steps: int = 1000,
        kp: float = 80.0,
        kd: float = 2.0,
        action_scale: float = 0.5,
        target_speed: float = 0.8,
        pgs_iters: int = 8,
        reset_noise: float = 0.1,
    ):
        robot = make_anymal()
        self.robot = robot
        self.kp, self.kd = kp, kd
        self.action_scale = action_scale
        self.target_speed = target_speed
        self.reset_noise = reset_noise
        self._q_stand = jnp.asarray(stand_q(robot.tree))

        motors = robot.motors
        stand_targets, _ = motors.joint_state(
            self._q_stand, jnp.zeros(robot.tree.nv)
        )
        self._stand_targets = stand_targets

        def pd_controller(cmd, q, v, t):
            # cmd: (12,) PD target joint positions (motor order)
            qm, vm = motors.joint_state(q, v)
            return kp * (cmd - qm) - kd * vm

        engine = Engine(
            robot.tree,
            EngineOptions(
                dt=sim_dt,
                contact_model="constraint",
                pgs_iters=pgs_iters,
            ),
            motors=motors,
            controller=pd_controller,
        )
        super().__init__(engine, step_dt=step_dt, max_steps=max_steps)

    # -- MDP pieces ---------------------------------------------------------
    def _sample_state(self, key):
        tree = self.tree
        k1, k2 = jax.random.split(key)
        q = self._q_stand
        dq = self.reset_noise * jax.random.uniform(
            k1, (12,), minval=-1.0, maxval=1.0
        )
        q = q.at[7:].add(dq)
        v = 0.1 * self.reset_noise * jax.random.normal(k2, (tree.nv,))
        return q, v

    def _base_frames(self, sim: SimState):
        quat = sim.q[3:7]
        R = so3.quat_to_matrix(quat)  # base → world
        grav_b = R.T @ jnp.array([0.0, 0.0, -1.0])  # gravity dir, base frame
        w_b = sim.v[3:6]  # already base-local (FREE joint convention)
        v_b = sim.v[0:3]
        return R, grav_b, w_b, v_b

    def _observe(self, sim: SimState, rng):
        _, grav_b, w_b, v_b = self._base_frames(sim)
        qm, vm = self.robot.motors.joint_state(sim.q, sim.v)
        return jnp.concatenate(
            [grav_b, w_b, v_b, qm - self._stand_targets, 0.1 * vm]
        )

    def _action_to_command(self, action, sim):
        action = jnp.clip(action, -1.0, 1.0)
        return self._stand_targets + self.action_scale * action

    def _reward(self, prev, action, sim: SimState) -> jax.Array:
        R, grav_b, w_b, v_b = self._base_frames(sim)
        v_world = R @ v_b
        track = jnp.exp(-jnp.square(v_world[0] - self.target_speed) / 0.25)
        upright = -grav_b[2]  # 1 when level
        lateral = jnp.square(v_world[1]) + 0.5 * jnp.square(w_b[2])
        ctrl = jnp.sum(jnp.square(action))
        return (
            1.0 * track
            + 0.5 * upright
            - 0.1 * lateral
            - 0.005 * ctrl
            - 0.05 * jnp.square(v_world[2])
        )

    def _terminated(self, sim: SimState) -> jax.Array:
        _, grav_b, _, _ = self._base_frames(sim)
        fallen = grav_b[2] > -0.6  # tilted > ~53°
        low = sim.q[2] < 0.3
        return fallen | low

    @property
    def action_size(self) -> int:
        return 12
