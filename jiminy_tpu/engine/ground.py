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


class FourierGround(struct.PyTreeNode):
    """Terrain as a random Fourier series — h(x, y) = Σₖ ampₖ ·
    sin(kxₖ·x + kyₖ·y + phaseₖ).

    TPU-first alternative to a grid heightmap for the HOT path: height
    and the analytic normal are pure vector math (K fused sin/cos terms,
    no gather), so the query runs *inside* the whole-substep Pallas
    kernel — grid interpolation needs dynamic gathers, which Mosaic
    lowers poorly and the current TPU backend miscompiles (see
    engine/solver.py). Sampling the wave vectors from a band spectrum
    (random Fourier features) reproduces Perlin-class rough ground
    (reference: random ground profiles, SURVEY.md §2.1
    "Random / terrain", §2.4 random ground per reset).

    Coefficients are pytree leaves: a vmapped caller passes (B, K)
    arrays for PER-ENV terrain domain randomization (each env resamples
    its own ground at reset)."""

    amp: jax.Array  # (K,)
    kx: jax.Array  # (K,)
    ky: jax.Array  # (K,)
    phase: jax.Array  # (K,)

    @property
    def n_terms(self) -> int:
        return self.amp.shape[-1]

    def query(self, xy: jax.Array) -> tuple[jax.Array, jax.Array]:
        arg = (
            xy[..., 0:1] * self.kx
            + xy[..., 1:2] * self.ky
            + self.phase
        )  # (..., K)
        s, c = jnp.sin(arg), jnp.cos(arg)
        h = jnp.sum(self.amp * s, axis=-1)
        dzdx = jnp.sum(self.amp * self.kx * c, axis=-1)
        dzdy = jnp.sum(self.amp * self.ky * c, axis=-1)
        n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


def sample_fourier_ground(
    key: jax.Array,
    n_terms: int = 16,
    amplitude: float = 0.12,
    wavelength: float = 2.0,
    octaves: int = 3,
    flat_radius: float = 0.0,
) -> FourierGround:
    """Sample a rough ground from a fractal band spectrum (jittable —
    call it inside ``reset`` for per-env terrain).

    Wave vectors draw uniformly in direction; magnitudes concentrate in
    ``octaves`` bands at 2π/wavelength · 2ᵒ (the Perlin octave ladder),
    with amplitudes halving per octave — same spectral envelope as
    ``terrain.perlin_ground``. Process std ≈ ``amplitude``/√2.
    ``flat_radius`` does NOT apply here (pure stationary process);
    envs level the spawn instead by querying h at the spawn point."""
    import numpy as np

    k_dir, k_mag, k_ph = jax.random.split(key, 3)
    K = n_terms
    theta = jax.random.uniform(k_dir, (K,), minval=0.0, maxval=2.0 * jnp.pi)
    octave = np.arange(K) % octaves  # static octave assignment
    k0 = 2.0 * np.pi / wavelength
    mag = jnp.asarray(k0 * 2.0**octave, jnp.float32) * jax.random.uniform(
        k_mag, (K,), minval=0.75, maxval=1.25
    )
    per_oct = np.bincount(octave, minlength=octaves)
    amp_np = 0.5**octave / np.sqrt(per_oct[octave])
    amp_np *= amplitude / np.sqrt(np.sum((0.5 ** np.arange(octaves)) ** 2))
    amp = jnp.asarray(amp_np, jnp.float32)
    phase = jax.random.uniform(k_ph, (K,), minval=0.0, maxval=2.0 * jnp.pi)
    return FourierGround(
        amp=amp.astype(jnp.float32),
        kx=(mag * jnp.cos(theta)).astype(jnp.float32),
        ky=(mag * jnp.sin(theta)).astype(jnp.float32),
        phase=phase.astype(jnp.float32),
    )


def _perlin_hash2(ix, iy, seed):
    """Arithmetic 2-D lattice hash (int32 mul/xor/shift — no permutation
    table, hence no gather): the TPU-native replacement for the
    table-based ``utils.random.PerlinNoise._hash``. Shifts are masked to
    emulate logical shift on int32."""
    h = (
        ix * jnp.int32(0x27D4EB2D)
        + iy * jnp.int32(0x165667B1)
        + seed
    )
    h = h ^ ((h >> 15) & jnp.int32(0x1FFFF))
    h = h * jnp.int32(0x2545F491)
    h = h ^ ((h >> 13) & jnp.int32(0x7FFFF))
    return h


def _fade(t):
    """Perlin quintic smoothstep 6t⁵−15t⁴+10t³ (C² at lattice lines)."""
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _dfade(t):
    """d/dt fade = 30t²(t−1)²."""
    u = t * (t - 1.0)
    return 30.0 * u * u


# std of one hash-gradient octave (measured over 2M samples; the (±1,±1)
# gradient set of utils.random.PerlinNoise._grad2)
_PERLIN_OCTAVE_STD = 0.306


def _perlin_octave(px, py, seed):
    """One octave of gradient noise at lattice scale 1: h, ∂h/∂px, ∂h/∂py.
    Same gradient set as ``utils.random.PerlinNoise._grad2`` (signs from
    the two low hash bits, g = (±1, ±1)) but with the arithmetic hash —
    identical math runs as jnp arrays here and as Mosaic lane ops in
    ``ops/substep_kernel._ground_query``."""
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    xf = px - ix
    yf = py - iy
    ixi = ix.astype(jnp.int32)
    iyi = iy.astype(jnp.int32)

    def corner(di, dj):
        h = _perlin_hash2(ixi + di, iyi + dj, seed)
        sx = jnp.where((h & 1) == 0, 1.0, -1.0)
        sy = jnp.where((h & 2) == 0, 1.0, -1.0)
        n = sx * (xf - di) + sy * (yf - dj)
        return n, sx, sy

    n00, sx00, sy00 = corner(0, 0)
    n10, sx10, sy10 = corner(1, 0)
    n01, sx01, sy01 = corner(0, 1)
    n11, sx11, sy11 = corner(1, 1)
    u, v = _fade(xf), _fade(yf)
    du, dv = _dfade(xf), _dfade(yf)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    h = nx0 + v * (nx1 - nx0)
    dnx0_dx = sx00 + u * (sx10 - sx00) + du * (n10 - n00)
    dnx1_dx = sx01 + u * (sx11 - sx01) + du * (n11 - n01)
    dh_dx = dnx0_dx + v * (dnx1_dx - dnx0_dx)
    dnx0_dy = sy00 + u * (sy10 - sy00)
    dnx1_dy = sy01 + u * (sy11 - sy01)
    dh_dy = dnx0_dy + v * (dnx1_dy - dnx0_dy) + dv * (nx1 - nx0)
    return h, dh_dx, dh_dy


class PerlinGround(struct.PyTreeNode):
    """Analytic fractal Perlin terrain — height, gradient and normal are
    pure lane math (int hash + selects + FMA, NO permutation-table
    gather), so the query runs *inside* the whole-substep Pallas kernel
    exactly like FourierGround/StairsGround.

    This is the TPU-native twin of the reference's RandomPerlinProcess
    ground (SURVEY.md §2.1 "Random / terrain"): same construction
    (lattice gradient noise, quintic fade, octave ladder with halving
    amplitudes) with the permutation table replaced by an arithmetic
    int32 hash — statistically equivalent terrain, gather-free. The
    table-based ``utils.random.PerlinNoise`` remains for reference-RNG
    parity fixtures; grid terrains remain via ``HeightmapGround``.

    ``seed``/``freq``/``amp`` are pytree leaves: a vmapped caller passes
    per-env values for terrain domain randomization (each env resamples
    its own ground at reset). ``seed`` is an integer carried in float32
    (exact up to 2²⁴ — the kernel input block is a single f32 matrix).

    octaves is static (baked into the compiled query)."""

    seed: jax.Array  # () float32 carrying an integer in [0, 2^24)
    freq: jax.Array  # () base lattice frequency = 1/wavelength
    amp: jax.Array  # () height std of the full fBm sum
    octaves: int = struct.field(pytree_node=False, default=3)

    @property
    def _norm(self) -> float:
        """fBm normalization: per-octave weights 2⁻ᵒ, unit process std."""
        import math

        s = sum((0.5**o) ** 2 for o in range(self.octaves))
        return 1.0 / (_PERLIN_OCTAVE_STD * math.sqrt(s))

    def query(self, xy: jax.Array) -> tuple[jax.Array, jax.Array]:
        x, y = xy[..., 0], xy[..., 1]
        seed = self.seed.astype(jnp.int32)
        scale = self.amp * self._norm
        h = jnp.zeros_like(x)
        gx = jnp.zeros_like(x)
        gy = jnp.zeros_like(x)
        for o in range(self.octaves):
            f_o = self.freq * (2.0**o)
            w_o = scale * (0.5**o)
            ho, gxo, gyo = _perlin_octave(
                x * f_o, y * f_o, seed + jnp.int32(1013 * o)
            )
            h = h + w_o * ho
            gx = gx + w_o * f_o * gxo
            gy = gy + w_o * f_o * gyo
        n = jnp.stack([-gx, -gy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


def sample_perlin_ground(
    key: jax.Array,
    amplitude: float = 0.08,
    wavelength: float = 1.5,
    octaves: int = 3,
) -> PerlinGround:
    """Random analytic Perlin ground (jittable — call inside ``reset``
    for per-env terrain). ``amplitude`` ≈ process std in meters (same
    convention as ``sample_fourier_ground``'s amplitude/√2... the fBm
    sum is normalized to std ≈ amplitude)."""
    seed = jax.random.randint(key, (), 0, 1 << 24)
    return PerlinGround(
        seed=seed.astype(jnp.float32),
        freq=jnp.float32(1.0 / wavelength),
        amp=jnp.float32(amplitude),
        octaves=octaves,
    )


class StairsGround(struct.PyTreeNode):
    """Analytic staircase rising along +x: ``h(x, y) = step_height ·
    clip(k + clip((u − k·w)/ramp, 0, 1), 0, n_steps)`` with
    ``u = x − x0``, ``k = floor(u/w)`` — each riser is a linear ramp of
    width ``ramp`` (the analytic twin of the reference's discretized
    stairs heightmap, whose risers are one grid cell wide;
    SURVEY.md §2.1 "Random / terrain" stairs generator).

    TPU-first alternative to ``terrain.stairs_ground`` (a grid
    ``HeightmapGround``) for the HOT path: height and gradient are pure
    vector math (floor/clip — no gather), so the query runs *inside*
    the whole-substep Pallas kernel exactly like ``FourierGround``.
    Parameters are pytree leaves — vmapped callers randomize stair
    geometry per env."""

    step_width: jax.Array  # ()
    step_height: jax.Array  # ()
    n_steps: jax.Array  # () float — top-step clamp
    ramp: jax.Array  # () riser ramp width (> 0)
    x0: jax.Array  # () x of the first riser's base

    @staticmethod
    def create(step_width=0.4, step_height=0.08, n_steps=10, ramp=0.05,
               x0=0.0) -> "StairsGround":
        f = jnp.float32
        return StairsGround(
            step_width=f(step_width), step_height=f(step_height),
            n_steps=f(n_steps), ramp=f(ramp), x0=f(x0),
        )

    def query(self, xy: jax.Array) -> tuple[jax.Array, jax.Array]:
        u = xy[..., 0] - self.x0
        k = jnp.floor(u / self.step_width)
        t = (u - k * self.step_width) / self.ramp
        tc = jnp.clip(t, 0.0, 1.0)
        s = jnp.clip(k + tc, 0.0, self.n_steps)
        h = self.step_height * s
        inner = (
            (t > 0.0) & (t < 1.0) & (k + tc > 0.0) & (k + tc < self.n_steps)
        )
        dzdx = jnp.where(inner, self.step_height / self.ramp, 0.0)
        n = jnp.stack(
            [-dzdx, jnp.zeros_like(h), jnp.ones_like(h)], axis=-1
        )
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
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
