"""Locomotion env base — random terrain, external pushes, safety
terminations.

Reference: gym_jiminy's ``WalkerJiminyEnv`` — random ground profile,
external push impulses/profiles, safety terminations on top of
``BaseJiminyEnv`` (SURVEY.md §2.4 "Locomotion env base").

TPU redesign:
- ONE terrain heightmap is shared by the whole batch (memory: a per-env
  grid would be GBs at batch 4096); per-env diversity comes from random
  spawn positions over the map, randomized initial joints, and per-env
  push schedules.
- Pushes are device-resident state (info dict): each env samples
  Bernoulli push onsets, a world-frame force on the base, and a duration;
  the force enters the engine as an external wrench (§2.1 external
  forces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.engine import (
    Engine,
    EngineOptions,
    PDController,
    SimState,
)
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.math import so3
from jiminy_tpu.robot import Robot


class WalkerEnv(BaseEnv):
    """Velocity-tracking locomotion for any legged Robot with motors and
    foot contact points on a floating base.

    Action: (nm,) PD target offsets around ``stand_pose`` in [-1, 1].
    Observation: gravity dir (3) + base ang vel (3) + base lin vel (3)
    [base-local] + motor positions rel. stand (nm) + scaled motor
    velocities (nm).
    """

    def __init__(
        self,
        robot: Robot,
        stand_pose,  # (nq,) nominal configuration (feet on flat ground)
        step_dt: float = 0.02,
        sim_dt: float = 2.5e-3,
        max_steps: int = 1000,
        kp: float = 80.0,
        kd: float = 2.0,
        action_scale: float = 0.5,
        target_speed: float = 0.8,
        pgs_iters: int = 8,
        reset_noise: float = 0.1,
        ground=None,
        spawn_radius: float = 0.0,  # random spawn disk over the terrain
        push_magnitude: float = 0.0,  # N; 0 disables pushes
        push_prob: float = 0.01,  # per-step probability of a push onset
        push_duration: float = 0.1,  # s
        min_height: float = 0.3,
        max_tilt_cos: float = 0.6,
        engine_options: EngineOptions | None = None,
        constraints: tuple = (),
        collision_pairs: tuple = (),  # engine.collision.CollisionPair
        # observation source. DEFAULT "sensors" since round 5: the
        # policy sees delayed/biased/noisy IMU + encoder MEASUREMENTS —
        # the reference's refresh_observation semantics (SURVEY.md
        # §3.2). "state" opts into the privileged fast path (bench,
        # teacher policies, tests pinning exact obs layouts).
        observe: str = "sensors",  # "sensors" | "state" (privileged)
        ground_sampler=None,  # callable key -> FourierGround: per-env terrain
        reward_fn=None,  # compositions.RewardFn: replaces the built-in reward
        termination_fn=None,  # compositions.TerminationFn: replaces built-in
        model_randomization=None,  # randomization.ModelRandomization
        nan_guard: bool = True,  # BaseEnv: auto-reset non-finite envs
    ):
        self.robot = robot
        self.ground_sampler = ground_sampler
        # per-episode inertial/motor/sensor randomization (reference:
        # model randomization hooks, SURVEY.md §2.1 "Model"). Params are
        # pytree leaves in info → resampled on every auto-reset; they
        # ride the randomized whole-substep kernel variant at full
        # speed (engine/randomization.py).
        self.model_randomization = model_randomization
        if ground_sampler is not None:
            if ground is not None:
                raise ValueError("pass ground OR ground_sampler, not both")
            # template ground: fixes the kernel's Fourier term count; the
            # real per-env coefficients are sampled in reset and flow
            # through info (VERDICT r1 missing #7: per-env terrain)
            ground = ground_sampler(jax.random.PRNGKey(0))
        self.kp, self.kd = kp, kd
        self.action_scale = action_scale
        self.target_speed = target_speed
        self.reset_noise = reset_noise
        self.spawn_radius = spawn_radius
        self.push_magnitude = push_magnitude
        self.push_prob = push_prob
        self.push_steps = max(1, round(push_duration / step_dt))
        self.min_height = min_height
        self.max_tilt_cos = max_tilt_cos
        self._q_stand = jnp.asarray(stand_pose)
        # declarative MDP (reference's L4 pattern, SURVEY.md §2.4
        # "Compositions"): when given, reward/termination are
        # compositions over a QuantityContext instead of the hand-coded
        # defaults below — see envs.anymal.anymal_declarative_mdp
        self._reward_fn = reward_fn
        self._termination_fn = termination_fn

        motors = robot.motors
        self._stand_targets, _ = motors.joint_state(
            self._q_stand, jnp.zeros(robot.tree.nv)
        )
        opts = engine_options or EngineOptions(
            dt=sim_dt,
            contact_model="constraint",
            pgs_iters=pgs_iters,
            # RL envs don't consume solver telemetry; skip its ~5% cost
            compute_solver_residual=False,
        )
        engine = Engine(
            robot.tree,
            opts,
            ground=ground if ground is not None else FlatGround(),
            motors=motors,
            # declarative PD so the engine can bake it into the
            # multi-substep kernel (an opaque closure cannot be)
            controller=PDController(kp, kd),
            constraints=constraints,
            # declared body-body/self-collision pairs (resolved
            # in-kernel on the whole-substep fast path)
            collision_pairs=tuple(collision_pairs),
        )
        # sensor-driven observation path: the policy sees delayed/biased/
        # noisy IMU + encoder MEASUREMENTS, never privileged sim state
        # (reference behavior, SURVEY.md §3.2 refresh_observation; VERDICT
        # r1 missing #1). Rewards/terminations stay privileged (train-time
        # only).
        suite = None
        if observe == "sensors":
            suite = robot.sensors
            if suite is None:
                raise ValueError(
                    "observe='sensors' requires the robot to carry a "
                    "sensor suite (build with make_*(sensor_period=...))"
                )
            import numpy as np

            enc = next(g for g in suite.groups if g.type == "encoder")
            # static encoder→motor permutation (match on q index)
            enc_q = [robot.tree.q_off[j] for j in enc.target]
            self._enc_perm = [
                enc_q.index(qi) for qi in robot.motors.q_idx
            ]
        elif observe != "state":
            raise ValueError(f"unknown observe mode {observe!r}")
        self.observe_mode = observe
        super().__init__(
            engine, step_dt=step_dt, max_steps=max_steps, sensors=suite,
            nan_guard=nan_guard,
        )

    # ---- spawn / reset -----------------------------------------------------
    def _ground_from_key(self, key):
        """Per-env ground derived DETERMINISTICALLY from the reset key, so
        ``_sample_state`` (spawn height) and ``_init_info`` (the ground
        leaves carried in info) agree without threading state."""
        return self.ground_sampler(jax.random.fold_in(key, 7))

    def _sample_state(self, key):
        tree = self.tree
        k1, k2, k3 = jax.random.split(key, 3)
        q = self._q_stand
        nm = self.robot.nmotors
        dq = self.reset_noise * jax.random.uniform(
            k1, (nm,), minval=-1.0, maxval=1.0
        )
        q = self.robot.motors._scatter_add(q, self.robot.motors.q_idx, dq)
        ground = (
            self._ground_from_key(key)
            if self.ground_sampler is not None
            else self.engine.ground
        )
        if self.spawn_radius > 0:
            xy = self.spawn_radius * jax.random.uniform(
                k3, (2,), minval=-1.0, maxval=1.0
            )
            h, _ = ground.query(xy)
            q = q.at[0:2].set(xy).at[2].add(h)
        elif self.ground_sampler is not None:
            h, _ = ground.query(q[0:2])
            q = q.at[2].add(h)
        v = 0.1 * self.reset_noise * jax.random.normal(k2, (tree.nv,))
        return q, v

    # ---- pushes (device-resident schedule) ---------------------------------
    def _init_info(self, key):
        info = {}
        if self.ground_sampler is not None:
            info["ground"] = self._ground_from_key(key)
        if self.model_randomization is not None:
            mr = self.model_randomization
            k_mp, k_sb = jax.random.split(jax.random.fold_in(key, 11))
            info["model_params"] = mr.sample(
                k_mp, self.tree, self.robot.motors
            )
            if mr.sensor_bias > 0.0 and self.observe_mode == "sensors":
                info["sensor_bias"] = mr.sample_sensor_bias(
                    k_sb, self.robot.sensors
                )
        if self.push_magnitude <= 0.0:
            return info
        return {
            **info,
            "push_force": jnp.zeros(3),
            "push_steps_left": jnp.int32(0),
        }

    def _step_ground(self, info):
        return info.get("ground")

    def _model_params(self, info):
        return info.get("model_params")

    def _sensor_bias(self, info):
        return info.get("sensor_bias")

    def _update_info(self, prev: EnvState, nxt_sim: SimState, rng) -> dict:
        if self.push_magnitude <= 0.0:
            return {}
        k1, k2 = jax.random.split(rng)
        start = (
            jax.random.bernoulli(k1, self.push_prob)
            & (prev.info["push_steps_left"] <= 0)
        )
        theta = jax.random.uniform(k2, (), minval=0.0, maxval=2 * jnp.pi)
        new_force = self.push_magnitude * jnp.array(
            [jnp.cos(theta), jnp.sin(theta), 0.0]
        )
        left = prev.info["push_steps_left"]
        return {
            "push_force": jnp.where(start, new_force, prev.info["push_force"]),
            "push_steps_left": jnp.where(
                start, jnp.int32(self.push_steps), jnp.maximum(left - 1, 0)
            ),
        }

    def _base_wrench(self, state: EnvState):
        if self.push_magnitude <= 0.0:
            return None
        active = state.info["push_steps_left"] > 0
        f_world = jnp.where(active, 1.0, 0.0) * state.info["push_force"]
        # world force at the base origin → local wrench on body 0; rides
        # the whole-substep kernel (Engine.step base_wrench input), so
        # push-robustness training keeps the fast path
        R = so3.quat_to_matrix(state.sim.q[3:7])
        return jnp.concatenate([jnp.zeros(3), R.T @ f_world])

    # ---- MDP ---------------------------------------------------------------
    def _base_frames(self, sim: SimState):
        R = so3.quat_to_matrix(sim.q[3:7])
        grav_b = R.T @ jnp.array([0.0, 0.0, -1.0])
        return R, grav_b, sim.v[3:6], sim.v[0:3]

    def _observe(self, sim: SimState, rng):
        _, grav_b, w_b, v_b = self._base_frames(sim)
        qm, vm = self.robot.motors.joint_state(sim.q, sim.v)
        return jnp.concatenate(
            [grav_b, w_b, v_b, qm - self._stand_targets, 0.1 * vm]
        )

    def _observe_from_sensors(self, readings: dict, sim: SimState, rng):
        """Measurement observation, same layout/mirror structure as the
        privileged one: gravity dir from the IMU quat (3), gyro (3),
        scaled accelerometer (3) in place of base lin vel, encoder motor
        positions rel. stand (nm), scaled encoder velocities (nm)."""
        imu = readings["imu"][0]
        R = so3.quat_to_matrix(imu[:4])
        grav_b = R.T @ jnp.array([0.0, 0.0, -1.0])
        gyro = imu[4:7]
        accel = imu[7:10]
        enc = readings["encoder"]
        # static reorder encoder→motor (no gather: TPU-safe)
        enc = jnp.stack([enc[i] for i in self._enc_perm])
        qm, vm = enc[:, 0], enc[:, 1]
        return jnp.concatenate(
            [grav_b, gyro, 0.05 * accel, qm - self._stand_targets, 0.1 * vm]
        )

    def _action_to_command(self, action, sim):
        action = jnp.clip(action, -1.0, 1.0)
        return self._stand_targets + self.action_scale * action

    def _quantity_ctx(self, sim: SimState, info: dict | None):
        from jiminy_tpu.envs.quantities import QuantityContext

        ground = (
            info["ground"] if info and "ground" in info
            else self.engine.ground
        )
        return QuantityContext(self.tree, sim, ground=ground)

    def _reward(self, prev, action, sim: SimState) -> jax.Array:
        if self._reward_fn is not None:
            return self._reward_fn(
                self._quantity_ctx(sim, prev.info), action
            )
        R, grav_b, w_b, v_b = self._base_frames(sim)
        v_world = R @ v_b
        track = jnp.exp(-jnp.square(v_world[0] - self.target_speed) / 0.25)
        upright = -grav_b[2]
        lateral = jnp.square(v_world[1]) + 0.5 * jnp.square(w_b[2])
        ctrl = jnp.sum(jnp.square(action))
        return (
            1.0 * track
            + 0.5 * upright
            - 0.1 * lateral
            - 0.005 * ctrl
            - 0.05 * jnp.square(v_world[2])
        )

    def _terminated(self, sim: SimState, info: dict | None = None) -> jax.Array:
        if self._termination_fn is not None:
            return self._termination_fn(self._quantity_ctx(sim, info))
        _, grav_b, _, _ = self._base_frames(sim)
        fallen = grav_b[2] > -self.max_tilt_cos
        # height above local ground (the env's own terrain if per-env)
        ground = (
            info["ground"] if info and "ground" in info
            else self.engine.ground
        )
        h, _ = ground.query(sim.q[:2])
        low = (sim.q[2] - h) < self.min_height
        return fallen | low

    @property
    def action_size(self) -> int:
        return self.robot.nmotors
