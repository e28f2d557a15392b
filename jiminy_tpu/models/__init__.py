"""Robot model builders (programmatic equivalents of the reference's data/
URDF assets: toys_models, quadrupeds, bipeds — SURVEY.md §1 "Assets")."""

from jiminy_tpu.models.toys import (
    make_pendulum,
    make_double_pendulum,
    make_cartpole,
    make_acrobot,
    make_ball,
    make_free_box,
)
from jiminy_tpu.models.quadruped import (
    ANYMAL,
    SPOTMICRO,
    QuadrupedParams,
    make_anymal,
    make_quadruped,
    make_spotmicro,
    stand_q,
)
from jiminy_tpu.models.humanoid import ATLAS, atlas_stand_q, make_atlas
from jiminy_tpu.models.biped import make_cassie
from jiminy_tpu.models.ant import make_ant

__all__ = [
    "make_pendulum",
    "make_double_pendulum",
    "make_cartpole",
    "make_acrobot",
    "make_ball",
    "make_free_box",
    "QuadrupedParams",
    "ANYMAL",
    "SPOTMICRO",
    "make_anymal",
    "make_quadruped",
    "make_spotmicro",
    "stand_q",
    "ATLAS",
    "make_atlas",
    "atlas_stand_q",
    "make_cassie",
    "make_ant",
]
