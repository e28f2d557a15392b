"""RL environments (functional core + gymnasium adapter)."""

from jiminy_tpu.envs.base import BaseEnv, EnvState
from jiminy_tpu.envs.cartpole import CartPoleEnv
from jiminy_tpu.envs.acrobot import AcrobotEnv
from jiminy_tpu.envs.anymal import ANYmalEnv

__all__ = ["BaseEnv", "EnvState", "CartPoleEnv", "AcrobotEnv", "ANYmalEnv"]
