"""jiminy_tpu — a TPU-native poly-articulated physics engine and RL env suite.

A from-scratch reimplementation of the capabilities of Jiminy
(matthieuvigne/jiminy, a fork of duburcqa/jiminy), designed TPU-first:

- Rigid-body algorithms (ABA / RNEA / CRBA, Featherstone) as pure JAX
  functions over a static ``KinematicTree`` pytree, ``vmap``-able across
  thousands of environment instances.
- Fixed-step Lie-group integrators compiled into a single ``jit`` step.
- Contact (spring-damper penalty and constraint-based PGS impulse solver),
  motors, sensors (IMU / encoder / effort / contact / force) with delay,
  bias and noise — all device-resident.
- A functional gym layer with device-side auto-reset, observer/controller
  pipeline blocks, reward/termination compositions and a quantity cache.
- Scale-out via ``jax.sharding`` meshes + ``shard_map``; an anakin-style
  PPO learner that keeps rollout and learning inside one jitted program.

The reference architecture is documented in ``SURVEY.md`` at the repo root;
capability citations in docstrings point at the corresponding reference
component (upstream Jiminy paths, per SURVEY.md provenance note).
"""

__version__ = "0.1.0"

from jiminy_tpu.core.tree import KinematicTree, JointType
from jiminy_tpu.core import algos
from jiminy_tpu.math import so3, spatial

__all__ = [
    "KinematicTree",
    "JointType",
    "algos",
    "so3",
    "spatial",
]
