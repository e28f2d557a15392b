"""Projected Gauss-Seidel (PGS) impulse solver, batched and fixed-iteration.

Reference: jiminy's ``PGSSolver::SolveBoxedForwardDynamics`` — an impulse
solver over all active constraints with friction-cone projection for
contacts, bounds handling and over-relaxation (SURVEY.md §2.1 "Constraint
solver").

TPU-first design decisions:
- **Fixed iteration count** (no data-dependent exit): under ``vmap`` a
  convergence test would diverge lockstep across the batch
  (SURVEY.md §7 hard-parts "PGS convergence with fixed iteration counts").
  The residual is returned so callers can telemeter convergence.
- The Gauss-Seidel sweep over constraint blocks is unrolled at trace time
  (the block structure is static); the iteration loop is a ``lax.scan``.
- Inactive constraints are masked (their impulse is forced to zero) rather
  than removed, keeping all shapes static.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class BlockSpec(NamedTuple):
    """Static description of one constraint block in the stacked system.

    kind:
      - "equality": bilateral rows (weld, distance, joint lock, wheel)
      - "contact": 3 rows [t1, t2, normal]; λ_n ≥ 0, ‖λ_t‖ ≤ μ·λ_n
      - "lower": unilateral rows, λ ≥ 0 (e.g. joint lower bound)
      - "upper": unilateral rows, λ ≤ 0 (e.g. joint upper bound)
    """

    kind: str
    start: int
    size: int


def pgs_solve(
    A: jax.Array,  # (nc, nc) Delassus matrix J M⁻¹ Jᵀ (+ regularization)
    b: jax.Array,  # (nc,) rhs: target_velocity − J v_free
    blocks: Sequence[BlockSpec],
    mu: jax.Array,  # (nc,) friction coef per row (used on contact blocks)
    active: jax.Array,  # (nc,) bool mask per row
    lam0: jax.Array | None = None,
    iters: int = 16,
    relax: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Solve A·λ = b subject to per-block projections. Returns (λ, residual∞).

    Gauss-Seidel with over-relaxation ``relax``; warm start ``lam0``.
    """
    nc = A.shape[0]
    lam = jnp.zeros(nc, dtype=A.dtype) if lam0 is None else lam0
    lam = jnp.where(active, lam, 0.0)
    # guard the diagonal so masked/degenerate rows don't divide by ~0
    diag = jnp.maximum(jnp.diagonal(A), 1e-8)

    def sweep(lam, _):
        for blk in blocks:
            s, k = blk.start, blk.size
            if blk.kind == "contact":
                # normal row last in the block: solve it first, clamp ≥ 0
                i_n = s + 2
                r = b[i_n] - A[i_n] @ lam
                ln = jnp.maximum(lam[i_n] + relax * r / diag[i_n], 0.0)
                ln = jnp.where(active[i_n], ln, 0.0)
                lam = lam.at[i_n].set(ln)
                # tangent rows, then project onto the friction cone
                for i_t in (s, s + 1):
                    r = b[i_t] - A[i_t] @ lam
                    lt = lam[i_t] + relax * r / diag[i_t]
                    lam = lam.at[i_t].set(jnp.where(active[i_t], lt, 0.0))
                lt = lam[s : s + 2]
                tn = jnp.linalg.norm(lt)
                lim = mu[i_n] * ln
                scale = jnp.where(tn > lim, lim / jnp.maximum(tn, 1e-12), 1.0)
                lam = lam.at[s : s + 2].set(lt * scale)
            else:
                for i in range(s, s + k):
                    r = b[i] - A[i] @ lam
                    li = lam[i] + relax * r / diag[i]
                    if blk.kind == "lower":
                        li = jnp.maximum(li, 0.0)
                    elif blk.kind == "upper":
                        li = jnp.minimum(li, 0.0)
                    lam = lam.at[i].set(jnp.where(active[i], li, 0.0))
        return lam, None

    lam, _ = jax.lax.scan(sweep, lam, None, length=iters)
    residual = jnp.max(
        jnp.where(active, jnp.abs(b - A @ lam), 0.0), initial=0.0
    )
    return lam, residual


def kkt_residual(
    A, b, lam, active, bounds_span, contact_colors
) -> jax.Array:
    """Max complementarity violation: equality rows contribute |r|;
    unilateral rows (bounds, contact normals) contribute |r| only while
    pushing (λ>0), else only the pushing-needed part max(r, 0); tangent
    rows at the friction-cone boundary are sliding — their residual is
    expected and not counted."""
    r = b - A @ lam
    viol = jnp.where(active, jnp.abs(r), 0.0)

    def unilateral(viol, s, e):
        u = jnp.where(lam[s:e] > 1e-6, jnp.abs(r[s:e]), jnp.maximum(r[s:e], 0.0))
        return viol.at[s:e].set(jnp.where(active[s:e], u, 0.0))

    if bounds_span is not None:
        s, k = bounds_span
        viol = unilateral(viol, s, s + k)
    for s, k in contact_colors:
        if k == 0:
            continue
        e = s + 3 * k
        blk_l = lam[s:e].reshape(k, 3)
        blk_r = r[s:e].reshape(k, 3)
        blk_a = active[s:e].reshape(k, 3)
        n_viol = jnp.where(
            blk_l[:, 2] > 1e-6, jnp.abs(blk_r[:, 2]),
            jnp.maximum(blk_r[:, 2], 0.0),
        )
        tn = jnp.sqrt(blk_l[:, 0] ** 2 + blk_l[:, 1] ** 2 + 1e-24)
        sliding = tn >= 0.999 * jnp.maximum(blk_l[:, 2], 1e-9)
        t_viol = jnp.where(sliding[:, None], 0.0, jnp.abs(blk_r[:, :2]))
        blk_v = jnp.concatenate([t_viol, n_viol[:, None]], axis=1)
        viol = viol.at[s:e].set(
            jnp.where(blk_a, blk_v, 0.0).reshape(3 * k)
        )
    return jnp.max(viol, initial=0.0)


def pgs_solve_grouped(
    A: jax.Array,
    b: jax.Array,
    mu: jax.Array,
    active: jax.Array,
    eq_blocks: Sequence[BlockSpec],
    bounds_span: tuple | None,  # (start, size): contiguous λ ≥ 0 rows
    contact_colors: Sequence[tuple],  # per color: (start, n_contacts),
    # rows laid out contiguously as n_contacts × [t1, t2, n]
    iters: int = 16,
    relax: float = 1.0,
    lam0: jax.Array | None = None,
    compute_residual: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Latency-optimized PGS: same math as :func:`pgs_solve`, but rows that
    barely couple update TOGETHER (projected Jacobi within a group) while
    groups update sequentially (Gauss-Seidel between groups):

    - all joint-bound rows in one vectorized step per sweep,
    - contacts per color (e.g. diagonal leg pairs) — within a color the
      three rows (t1, t2, n) update as stacked vector ops.

    This cuts the sequential dependency chain ~4× (the TPU cost of PGS is
    chain latency of tiny ops, not FLOPs).

    All row groups are addressed with STATIC slices — gather/scatter by
    index array is miscompiled by the current TPU backend when several
    gathers share one index vector (verified empirically: r/diag lowers
    to x/x). Callers must lay bound rows and each color's contact rows
    out contiguously."""
    nc = A.shape[0]
    lam = jnp.zeros(nc, dtype=A.dtype) if lam0 is None else lam0
    lam = jnp.where(active, lam, 0.0)
    diag = jnp.maximum(jnp.diagonal(A), 1e-8)

    def sweep(lam, _):
        for blk in eq_blocks:
            for i in range(blk.start, blk.start + blk.size):
                r = b[i] - A[i] @ lam
                li = lam[i] + relax * r / diag[i]
                lam = lam.at[i].set(jnp.where(active[i], li, 0.0))
        if bounds_span is not None:
            s, k = bounds_span
            r = b[s : s + k] - A[s : s + k] @ lam
            li = lam[s : s + k] + relax * r / diag[s : s + k]
            li = jnp.maximum(li, 0.0)
            lam = lam.at[s : s + k].set(
                jnp.where(active[s : s + k], li, 0.0)
            )
        for s, k in contact_colors:
            if k == 0:
                continue
            e = s + 3 * k

            def rows(x, j):  # static strided view: row j of each contact
                return x[s:e].reshape(k, 3)[:, j]

            def row_update(lam, j, lo=None):
                r = rows(b, j) - A[s:e].reshape(k, 3, nc)[:, j] @ lam
                li = rows(lam, j) + relax * r / rows(diag, j)
                if lo is not None:
                    li = jnp.maximum(li, lo)
                return jnp.where(rows(active, j), li, 0.0)

            def set_rows(lam, j, vals):
                blk = lam[s:e].reshape(k, 3).at[:, j].set(vals)
                return lam.at[s:e].set(blk.reshape(3 * k))

            lam = set_rows(lam, 2, row_update(lam, 2, lo=0.0))  # normals
            lam = set_rows(lam, 0, row_update(lam, 0))
            lam = set_rows(lam, 1, row_update(lam, 1))
            # friction-cone projection, vectorized over the color
            blk = lam[s:e].reshape(k, 3)
            tn = jnp.sqrt(blk[:, 0] ** 2 + blk[:, 1] ** 2 + 1e-24)
            lim = rows(mu, 2) * blk[:, 2]
            scale = jnp.where(tn > lim, lim / jnp.maximum(tn, 1e-12), 1.0)
            blk = blk.at[:, 0].set(blk[:, 0] * scale)
            blk = blk.at[:, 1].set(blk[:, 1] * scale)
            lam = lam.at[s:e].set(blk.reshape(3 * k))
        return lam, None

    lam, _ = jax.lax.scan(sweep, lam, None, length=iters)
    if compute_residual:
        residual = kkt_residual(
            A, b, lam, active, bounds_span, contact_colors
        )
    else:
        residual = jnp.zeros((), A.dtype)
    return lam, residual
