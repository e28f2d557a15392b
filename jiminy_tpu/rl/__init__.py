from jiminy_tpu.rl.networks import MLPPolicy
from jiminy_tpu.rl.ppo import PPOConfig, make_train_fn, train

__all__ = ["MLPPolicy", "PPOConfig", "make_train_fn", "train"]
