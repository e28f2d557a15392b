"""Ground profiles (heightmaps) queried inside the jitted step.

Reference: jiminy's ``groundProfile`` callback returning height+normal at an
(x, y) query, used by the contact pipeline (SURVEY.md §2.1 "Contact model"),
with random Perlin/stairs terrain generators (§2.1 "Random / terrain").

TPU-first: a ground profile must be a pure function of arrays. Two
implementations: analytically flat, and a bilinear-interpolated grid
heightmap (the compiled form of any generator — Perlin, stairs, steps)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class FlatGround(struct.PyTreeNode):
    """z = height everywhere, normal +z."""

    height: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))

    def query(self, xy: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(height, normal) at query point xy (..., 2)."""
        h = jnp.broadcast_to(self.height, xy.shape[:-1])
        n = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dtype=xy.dtype), xy.shape[:-1] + (3,)
        )
        return h, n


class HeightmapGround(struct.PyTreeNode):
    """Grid heightmap with bilinear interpolation and analytic normals.

    The grid covers ``[x0, x0+nx*dx) × [y0, y0+ny*dy)``; queries outside are
    clamped to the border (flat extension). Any terrain generator (Perlin,
    stairs, discretized combinators — jiminy's heightmap utils) compiles to
    this representation once at env-build time."""

    z: jax.Array  # (nx, ny)
    x0: jax.Array  # ()
    y0: jax.Array  # ()
    dx: jax.Array  # ()
    dy: jax.Array  # ()

    @staticmethod
    def create(z, x0=0.0, y0=0.0, dx=0.1, dy=0.1) -> "HeightmapGround":
        z = jnp.asarray(z, jnp.float32)
        return HeightmapGround(
            z=z,
            x0=jnp.float32(x0),
            y0=jnp.float32(y0),
            dx=jnp.float32(dx),
            dy=jnp.float32(dy),
        )

    def query(self, xy: jax.Array) -> tuple[jax.Array, jax.Array]:
        nx, ny = self.z.shape
        fx = (xy[..., 0] - self.x0) / self.dx
        fy = (xy[..., 1] - self.y0) / self.dy
        fx = jnp.clip(fx, 0.0, nx - 1.001)
        fy = jnp.clip(fy, 0.0, ny - 1.001)
        ix = jnp.floor(fx).astype(jnp.int32)
        iy = jnp.floor(fy).astype(jnp.int32)
        tx = fx - ix
        ty = fy - iy
        z00 = self.z[ix, iy]
        z10 = self.z[ix + 1, iy]
        z01 = self.z[ix, iy + 1]
        z11 = self.z[ix + 1, iy + 1]
        h = (
            z00 * (1 - tx) * (1 - ty)
            + z10 * tx * (1 - ty)
            + z01 * (1 - tx) * ty
            + z11 * tx * ty
        )
        # analytic gradient of the bilinear patch
        dzdx = ((z10 - z00) * (1 - ty) + (z11 - z01) * ty) / self.dx
        dzdy = ((z01 - z00) * (1 - tx) + (z11 - z10) * tx) / self.dy
        n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n
