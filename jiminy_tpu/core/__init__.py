"""Core rigid-body layer: kinematic tree, URDF loading, Featherstone algorithms."""

from jiminy_tpu.core.tree import KinematicTree, JointType, TreeBuilder
from jiminy_tpu.core import algos

__all__ = ["KinematicTree", "JointType", "TreeBuilder", "algos"]
