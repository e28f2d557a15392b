"""Concrete legged envs: Cassie, Atlas, Ant, Spotmicro.

Reference: the gym_jiminy env zoo — ``CassieJiminyEnv`` (closed loops),
``AtlasJiminyEnv`` (humanoid), ``AntJiminyEnv``, ``SpotmicroJiminyEnv``
(SURVEY.md §2.5). Each is a thin :class:`WalkerEnv` configuration; the
flagship :class:`ANYmalEnv` lives in envs/anymal.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from jiminy_tpu.envs.locomotion import WalkerEnv


class CassieEnv(WalkerEnv):
    """Biped with pushrod closed loops (DistanceConstraints in the PGS)
    and passive shin springs (BASELINE.json config #4)."""

    def __init__(self, step_dt: float = 0.02, sim_dt: float = 1e-3, **kwargs):
        from jiminy_tpu.models.biped import (
            cassie_self_collision_pairs,
            make_cassie,
        )

        robot, constraints, stand = make_cassie(
            sensor_period=kwargs.pop("sensor_period", sim_dt),
            sensor_delay=kwargs.pop("sensor_delay", 0.0),
            imu_noise=kwargs.pop("imu_noise", 0.0),
            encoder_noise=kwargs.pop("encoder_noise", 0.0),
            flexibility=kwargs.pop("flexibility", False),
        )
        # declared L/R thigh/shin/tarsus capsule pairs in the PGS
        # (reference: hpp-fcl self-collision pairs). Falls back off the
        # whole-substep kernel while active.
        if kwargs.pop("self_collision", False):
            kwargs.setdefault(
                "collision_pairs", cassie_self_collision_pairs()
            )
        super().__init__(
            robot,
            stand_pose=jnp.asarray(stand),
            step_dt=step_dt,
            sim_dt=sim_dt,
            kp=kwargs.pop("kp", 150.0),
            kd=kwargs.pop("kd", 6.0),
            action_scale=kwargs.pop("action_scale", 0.4),
            min_height=kwargs.pop("min_height", 0.6),
            constraints=constraints,
            **kwargs,
        )


class AtlasEnv(WalkerEnv):
    """Humanoid locomotion (BASELINE.json config #5: multi-host PPO).

    ``sim_dt=4e-3`` (5 substeps per control step) was A/B-validated
    against 2e-3: identical reward curve and fall rate over the first
    20M steps, 1.8× the training throughput (~38k vs 21k env-steps/s on
    one v5e chip at batch 2048)."""

    def __init__(self, step_dt: float = 0.02, sim_dt: float = 4e-3, **kwargs):
        from jiminy_tpu.models.humanoid import (
            atlas_self_collision_pairs,
            atlas_stand_q,
            make_atlas,
        )

        robot = make_atlas(
            sensor_period=kwargs.pop("sensor_period", sim_dt),
            sensor_delay=kwargs.pop("sensor_delay", 0.0),
            imu_noise=kwargs.pop("imu_noise", 0.0),
            encoder_noise=kwargs.pop("encoder_noise", 0.0),
        )
        # L/R thigh+shank capsule pairs + lower-arm-vs-torso-box pairs
        # (exact box SDF), all resolved in the whole-substep kernel
        if kwargs.pop("self_collision", False):
            kwargs.setdefault(
                "collision_pairs", atlas_self_collision_pairs()
            )
        super().__init__(
            robot,
            stand_pose=jnp.asarray(atlas_stand_q(robot.tree)),
            step_dt=step_dt,
            sim_dt=sim_dt,
            kp=kwargs.pop("kp", 300.0),
            kd=kwargs.pop("kd", 15.0),
            action_scale=kwargs.pop("action_scale", 0.4),
            min_height=kwargs.pop("min_height", 0.55),
            target_speed=kwargs.pop("target_speed", 0.5),
            **kwargs,
        )


class AntEnv(WalkerEnv):
    """Splayed-leg quadruped (classic benchmark)."""

    def __init__(self, step_dt: float = 0.05, sim_dt: float = 2.5e-3, **kwargs):
        from jiminy_tpu.models.ant import make_ant

        robot, stand = make_ant()
        super().__init__(
            robot,
            stand_pose=jnp.asarray(stand),
            step_dt=step_dt,
            sim_dt=sim_dt,
            kp=kwargs.pop("kp", 15.0),
            kd=kwargs.pop("kd", 0.8),
            action_scale=kwargs.pop("action_scale", 0.5),
            min_height=kwargs.pop("min_height", 0.12),
            target_speed=kwargs.pop("target_speed", 1.0),
            **kwargs,
        )


class SpotmicroEnv(WalkerEnv):
    """Small hobby quadruped."""

    def __init__(self, step_dt: float = 0.02, sim_dt: float = 1e-3, **kwargs):
        from jiminy_tpu.models.quadruped import (
            SPOTMICRO,
            make_spotmicro,
            stand_q,
        )

        robot = make_spotmicro(
            sensor_period=kwargs.pop("sensor_period", sim_dt),
            sensor_delay=kwargs.pop("sensor_delay", 0.0),
            imu_noise=kwargs.pop("imu_noise", 0.0),
            encoder_noise=kwargs.pop("encoder_noise", 0.0),
        )
        super().__init__(
            robot,
            stand_pose=jnp.asarray(stand_q(robot.tree, SPOTMICRO)),
            step_dt=step_dt,
            sim_dt=sim_dt,
            kp=kwargs.pop("kp", 4.0),
            kd=kwargs.pop("kd", 0.1),
            action_scale=kwargs.pop("action_scale", 0.4),
            min_height=kwargs.pop("min_height", 0.08),
            target_speed=kwargs.pop("target_speed", 0.3),
            **kwargs,
        )
