from jiminy_tpu.utils import health
from jiminy_tpu.utils.random import (
    PCG32,
    PeriodicFourierProcess,
    PeriodicGaussianProcess,
    PerlinNoise,
)

__all__ = [
    "PCG32",
    "PeriodicFourierProcess",
    "PeriodicGaussianProcess",
    "PerlinNoise",
    "health",
]
