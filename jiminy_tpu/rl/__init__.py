from jiminy_tpu.rl.logging import MetricsLogger, read_metrics
from jiminy_tpu.rl.networks import MLPPolicy
from jiminy_tpu.rl.ppo import PPOConfig, make_train_fn, train

__all__ = [
    "MLPPolicy",
    "MetricsLogger",
    "PPOConfig",
    "make_train_fn",
    "read_metrics",
    "train",
]
