"""Terrain generators and heightmap combinators.

Reference: jiminy's heightmap utilities — random Perlin ground, stairs
generator, and heightmap combinators sum/merge/discretize
(SURVEY.md §2.1 "Random / terrain", ``geometry.h``).

Every generator compiles to a ``HeightmapGround`` grid (bilinear
interpolation + analytic normals, queried inside the jitted step), so a
single compiled program serves any terrain; per-env terrains batch as a
stacked HeightmapGround pytree under vmap.
"""

from __future__ import annotations

import numpy as np

from jiminy_tpu.engine.ground import HeightmapGround
from jiminy_tpu.utils.random import PerlinNoise


def _grid(size: float, resolution: float):
    n = int(round(2.0 * size / resolution)) + 1
    xs = np.linspace(-size, size, n)
    return n, xs


def perlin_ground(
    seed: int = 0,
    size: float = 10.0,
    resolution: float = 0.1,
    amplitude: float = 0.15,
    wavelength: float = 2.0,
    octaves: int = 4,
    flat_radius: float = 0.0,
) -> HeightmapGround:
    """Fractal Perlin heightmap, reproducible from ``seed`` (PCG32-seeded
    gradient table). ``flat_radius`` levels a spawn disk at the origin."""
    noise = PerlinNoise(seed)
    n, xs = _grid(size, resolution)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    z = amplitude * noise.octaves(
        X / wavelength, Y / wavelength, n=octaves
    )
    if flat_radius > 0.0:
        r = np.sqrt(X**2 + Y**2)
        blend = np.clip((r - flat_radius) / max(resolution * 4, 1e-6), 0, 1)
        z = z * blend
    return HeightmapGround.create(
        z.astype(np.float32), x0=-size, y0=-size, dx=resolution, dy=resolution
    )


def stairs_ground(
    step_width: float = 0.3,
    step_height: float = 0.1,
    n_steps: int = 8,
    size: float = 10.0,
    resolution: float = 0.05,
    axis: int = 0,
) -> HeightmapGround:
    """Staircase along x (axis=0) or y (axis=1): flat before the origin,
    ``n_steps`` up, then a plateau (reference stairs generator)."""
    n, xs = _grid(size, resolution)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    c = X if axis == 0 else Y
    idx = np.clip(np.floor(c / step_width), 0, n_steps)
    z = idx * step_height
    return HeightmapGround.create(
        z.astype(np.float32), x0=-size, y0=-size, dx=resolution, dy=resolution
    )


def _binary_op(a: HeightmapGround, b: HeightmapGround, op) -> HeightmapGround:
    if a.z.shape != b.z.shape:
        raise ValueError("combining heightmaps requires identical grids")
    import jax.numpy as jnp

    return HeightmapGround(
        z=op(a.z, b.z), x0=a.x0, y0=a.y0, dx=a.dx, dy=a.dy
    )


def sum_ground(a: HeightmapGround, b: HeightmapGround) -> HeightmapGround:
    """Pointwise sum (reference heightmap ``sum`` combinator)."""
    return _binary_op(a, b, lambda x, y: x + y)


def merge_ground(a: HeightmapGround, b: HeightmapGround) -> HeightmapGround:
    """Pointwise max — union of solids (reference ``merge`` combinator)."""
    import jax.numpy as jnp

    return _binary_op(a, b, jnp.maximum)


def discretize_ground(a: HeightmapGround, quantum: float) -> HeightmapGround:
    """Quantize heights to multiples of ``quantum`` (reference
    ``discretize``), producing terraced terrain."""
    import jax.numpy as jnp

    return HeightmapGround(
        z=jnp.round(a.z / quantum) * quantum,
        x0=a.x0, y0=a.y0, dx=a.dx, dy=a.dy,
    )
