"""Small-matrix linear algebra, unrolled at trace time.

XLA's generic LAPACK-style Cholesky is built for large matrices; for the
nv×nv (≈6–40) mass matrices of articulated robots it is ~10× slower than
an unrolled factorization whose every scalar op vectorizes across the env
batch under ``vmap`` (measured on TPU v5: cho_factor 9 µs/env vs <1 µs
unrolled at nv=18, batch 4096). All loops below are Python loops over a
*static* dimension → they trace to straight-line VPU code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky(M: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower-triangular L with L Lᵀ = M, unrolled for small static n.

    Works on a single (n, n) matrix; batch via ``vmap``."""
    n = M.shape[-1]
    if jitter:
        M = M + jitter * jnp.eye(n, dtype=M.dtype)
    # build rows as python lists of scalars → one stacked matrix at the end
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(M[0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)])
        for i in range(n)
    ]
    return jnp.stack(rows)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """x with L x = b (L lower-triangular). b: (n,) or (n, m)."""
    n = L.shape[-1]
    x = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)


def solve_upper_t(L: jax.Array, b: jax.Array) -> jax.Array:
    """x with Lᵀ x = b (back substitution). b: (n,) or (n, m)."""
    n = L.shape[-1]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = b[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b given L = cholesky(M). b: (n,) or (n, m)."""
    return solve_upper_t(L, solve_lower(L, b))


def solve_psd(M: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """One-shot M x = b for small SPD M."""
    return cho_solve(cholesky(M, jitter=jitter), b)
