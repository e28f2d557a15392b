"""PCG32 inside the XLA program — uint32-pair emulation of the uint64
state (JAX disables x64 by default; TPUs have no native u64 anyway).

Complements the host-side numpy PCG32 in utils/random.py: this version
runs *inside* jitted code, so fixed-seed parity runs can consume the
reference's RNG stream on-device (SURVEY.md §2.7 item 6: "bit-exact
PCG32 implementation in JAX for fixed-seed parity runs").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_MULT_HI = jnp.uint32(0x5851F42D)  # 6364136223846793005 >> 32
_MULT_LO = jnp.uint32(0x4C957F2D)


class PCG32State(struct.PyTreeNode):
    state_hi: jax.Array  # uint32
    state_lo: jax.Array
    inc_hi: jax.Array
    inc_lo: jax.Array


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _mul64(ah, al, bh, bl):
    """Low 64 bits of a·b via 16-bit limb products (no u64 anywhere)."""

    def mul32x32(x, y):
        """(hi, lo) of x·y for uint32 x, y."""
        x0 = x & jnp.uint32(0xFFFF)
        x1 = x >> jnp.uint32(16)
        y0 = y & jnp.uint32(0xFFFF)
        y1 = y >> jnp.uint32(16)
        p00 = x0 * y0
        p01 = x0 * y1
        p10 = x1 * y0
        p11 = x1 * y1
        mid = (p00 >> jnp.uint32(16)) + (p01 & jnp.uint32(0xFFFF)) + (
            p10 & jnp.uint32(0xFFFF)
        )
        lo = (p00 & jnp.uint32(0xFFFF)) | (mid << jnp.uint32(16))
        hi = p11 + (p01 >> jnp.uint32(16)) + (p10 >> jnp.uint32(16)) + (
            mid >> jnp.uint32(16)
        )
        return hi, lo

    hi, lo = mul32x32(al, bl)
    hi = hi + al * bh + ah * bl  # cross terms contribute to the high word
    return hi, lo


def pcg32_init(seed: int | jax.Array, stream: int = 0x14057B7EF767814F >> 1):
    """Matches utils.random.PCG32 / the reference C++ stream exactly."""
    seed = jnp.asarray(seed, jnp.uint32)
    inc_raw = (int(stream) << 1) | 1
    inc_hi = jnp.uint32((inc_raw >> 32) & 0xFFFFFFFF)
    inc_lo = jnp.uint32(inc_raw & 0xFFFFFFFF)
    st = PCG32State(
        state_hi=jnp.uint32(0), state_lo=jnp.uint32(0),
        inc_hi=inc_hi, inc_lo=inc_lo,
    )
    st = _step(st)
    hi, lo = _add64(st.state_hi, st.state_lo, jnp.uint32(0), seed)
    st = st.replace(state_hi=hi, state_lo=lo)
    return _step(st)


def _step(st: PCG32State) -> PCG32State:
    hi, lo = _mul64(st.state_hi, st.state_lo, _MULT_HI, _MULT_LO)
    hi, lo = _add64(hi, lo, st.inc_hi, st.inc_lo)
    return st.replace(state_hi=hi, state_lo=lo)


def pcg32_next(st: PCG32State) -> tuple[PCG32State, jax.Array]:
    """→ (state', uint32 output), bit-exact PCG-XSH-RR."""
    old_hi, old_lo = st.state_hi, st.state_lo
    st = _step(st)
    # xorshifted = ((state >> 18) ^ state) >> 27  — on the 64-bit value
    s18_hi = old_hi >> jnp.uint32(18)
    s18_lo = (old_lo >> jnp.uint32(18)) | (old_hi << jnp.uint32(14))
    x_hi = s18_hi ^ old_hi
    x_lo = s18_lo ^ old_lo
    xorshifted = (x_lo >> jnp.uint32(27)) | (x_hi << jnp.uint32(5))
    rot = old_hi >> jnp.uint32(27)  # bits 59..63 of the 64-bit state
    out = (xorshifted >> rot) | (
        xorshifted << ((jnp.uint32(32) - rot) & jnp.uint32(31))
    )
    return st, out


def pcg32_uniform(st: PCG32State, lo=0.0, hi=1.0):
    st, u = pcg32_next(st)
    return st, lo + (hi - lo) * (u.astype(jnp.float32) / jnp.float32(4294967296.0))
