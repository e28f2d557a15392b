"""Robot model builders (programmatic equivalents of the reference's data/
URDF assets: toys_models, quadrupeds, bipeds — SURVEY.md §1 "Assets")."""

from jiminy_tpu.models.toys import (
    make_pendulum,
    make_double_pendulum,
    make_cartpole,
    make_acrobot,
    make_free_box,
)

__all__ = [
    "make_pendulum",
    "make_double_pendulum",
    "make_cartpole",
    "make_acrobot",
    "make_free_box",
]
