"""RL environments (functional core + gymnasium adapter)."""

from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.envs.cartpole import CartPoleEnv
from jiminy_tpu.envs.acrobot import AcrobotEnv

__all__ = ["BaseEnv", "EnvState", "CartPoleEnv", "AcrobotEnv"]
