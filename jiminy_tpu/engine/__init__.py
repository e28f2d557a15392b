"""Simulation engine: steppers, contact models, constraints, PGS solver."""

from jiminy_tpu.engine.engine import Engine, EngineOptions, SimState
from jiminy_tpu.engine.ground import FlatGround, HeightmapGround
from jiminy_tpu.engine.contact import ContactParams

__all__ = [
    "Engine",
    "EngineOptions",
    "SimState",
    "FlatGround",
    "HeightmapGround",
    "ContactParams",
]
