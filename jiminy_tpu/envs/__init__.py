"""RL environments (functional core + gymnasium adapter)."""

from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.envs.cartpole import CartPoleEnv
from jiminy_tpu.envs.acrobot import AcrobotEnv
from jiminy_tpu.envs.anymal import ANYmalEnv, anymal_declarative_mdp
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.envs.legged import AntEnv, AtlasEnv, CassieEnv, SpotmicroEnv
from jiminy_tpu.envs.pipeline import build_pipeline
from jiminy_tpu.envs.registration import register_envs

__all__ = [
    "BaseEnv",
    "EnvState",
    "CartPoleEnv",
    "AcrobotEnv",
    "ANYmalEnv",
    "anymal_declarative_mdp",
    "WalkerEnv",
    "AntEnv",
    "AtlasEnv",
    "CassieEnv",
    "SpotmicroEnv",
    "build_pipeline",
    "register_envs",
]
