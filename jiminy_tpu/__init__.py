"""jiminy_tpu — a TPU-native poly-articulated physics engine and RL env suite.

A from-scratch reimplementation of the capabilities of Jiminy
(matthieuvigne/jiminy, a fork of duburcqa/jiminy), designed TPU-first:

- Rigid-body algorithms (ABA / RNEA / CRBA, Featherstone) as pure JAX
  functions over a static ``KinematicTree`` pytree, ``vmap``-able across
  thousands of environment instances.
- Fixed-step Lie-group integrators compiled into a single ``jit`` step
  (plus adaptive DOPRI for single-trajectory accuracy runs).
- Contacts (spring-damper penalty and constraint-based PGS impulse solver),
  kinematic constraints, motors, sensors (IMU / encoder / effort / contact
  / force) with delay, bias and noise — all device-resident.
- A functional gym layer with device-side auto-reset, observer/controller
  pipeline blocks, reward/termination compositions and a quantity cache.
- Scale-out via ``jax.sharding`` meshes + ``shard_map``; an anakin-style
  PPO learner that keeps rollout and learning inside one jitted program.

The reference architecture is documented in ``SURVEY.md`` at the repo root;
capability citations in docstrings point at the corresponding reference
component (upstream Jiminy paths, per SURVEY.md provenance note).
"""

__version__ = "0.1.0"

from jiminy_tpu.core.tree import (
    JointType,
    KinematicTree,
    TreeBuilder,
    merge_trees,
)
from jiminy_tpu.core import algos
from jiminy_tpu.engine.engine import (
    Engine,
    EngineOptions,
    PDController,
    SimState,
)
from jiminy_tpu.math import so3, spatial
from jiminy_tpu.robot import Robot, build_robot
from jiminy_tpu.simulator import Simulator
from jiminy_tpu.telemetry import TelemetryLog, read_log

__all__ = [
    "KinematicTree",
    "TreeBuilder",
    "JointType",
    "merge_trees",
    "algos",
    "so3",
    "spatial",
    "Engine",
    "EngineOptions",
    "PDController",
    "SimState",
    "Robot",
    "build_robot",
    "Simulator",
    "TelemetryLog",
    "read_log",
]
