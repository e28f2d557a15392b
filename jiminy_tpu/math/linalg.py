"""Small-matrix linear algebra, column-vectorized and unrolled at trace
time.

XLA's generic LAPACK-style Cholesky is built for large matrices; for the
nv×nv (≈6–40) mass matrices of articulated robots it is ~10× slower than
an unrolled factorization on TPU (measured: cho_factor 9 µs/env vs <1 µs
unrolled at nv=18, batch 4096). The loops below are Python loops over the
*static* dimension, but each iteration is a whole-column vector op —
O(n) HLO instructions total, so compile time stays sane for humanoid-scale
nv (a fully scalar-unrolled version stalled XLA's CPU backend at nv=30),
and every op vectorizes across the env batch under ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky(M: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower-triangular L with L Lᵀ = M (Cholesky–Crout, column at a time).

    Works on a single (n, n) matrix; batch via ``vmap``."""
    n = M.shape[-1]
    if jitter:
        M = M + jitter * jnp.eye(n, dtype=M.dtype)
    L = jnp.zeros_like(M)
    for j in range(n):
        # s = M[j:, j] − L[j:, :j] · L[j, :j]   (one matvec per column)
        s = M[j:, j] - (L[j:, :j] @ L[j, :j] if j else 0.0)
        d = jnp.sqrt(jnp.maximum(s[0], 1e-12))
        col = s / d
        col = col.at[0].set(d)
        L = L.at[j:, j].set(col)
    return L


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """x with L x = b (L lower-triangular). b: (n,) or (n, m)."""
    n = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(n):
        s = b[i] - (L[i, :i] @ x[:i] if i else 0.0)
        x = x.at[i].set(s / L[i, i])
    return x


def solve_upper_t(L: jax.Array, b: jax.Array) -> jax.Array:
    """x with Lᵀ x = b (back substitution). b: (n,) or (n, m)."""
    n = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(n - 1, -1, -1):
        s = b[i] - (L[i + 1 :, i] @ x[i + 1 :] if i < n - 1 else 0.0)
        x = x.at[i].set(s / L[i, i])
    return x


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b given L = cholesky(M). b: (n,) or (n, m)."""
    return solve_upper_t(L, solve_lower(L, b))


def solve_psd(M: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """One-shot M x = b for small SPD M."""
    return cho_solve(cholesky(M, jitter=jitter), b)
