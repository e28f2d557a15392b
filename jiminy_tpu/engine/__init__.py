"""Simulation engine: steppers, contact models, constraints, PGS solver."""

from jiminy_tpu.engine.engine import (
    Engine,
    EngineOptions,
    PDController,
    SimState,
)
from jiminy_tpu.engine.ground import (
    FlatGround,
    FourierGround,
    HeightmapGround,
    StairsGround,
    sample_fourier_ground,
)
from jiminy_tpu.engine.contact import ContactParams
from jiminy_tpu.engine.collision import (
    Box,
    Capsule,
    CollisionPair,
    ConvexMesh,
    Sphere,
    shape_for_link,
)
from jiminy_tpu.engine.randomization import ModelParams, ModelRandomization

__all__ = [
    "ModelParams",
    "ModelRandomization",
    "Sphere",
    "Capsule",
    "Box",
    "ConvexMesh",
    "CollisionPair",
    "shape_for_link",
    "Engine",
    "EngineOptions",
    "PDController",
    "SimState",
    "FlatGround",
    "FourierGround",
    "sample_fourier_ground",
    "HeightmapGround",
    "StairsGround",
    "ContactParams",
]
