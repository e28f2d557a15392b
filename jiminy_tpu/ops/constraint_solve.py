"""Batched constraint-solve chain as one VMEM-resident Pallas kernel.

The impulse substep's serial bottleneck is the dense solve chain
(engine/engine.py `_impulse_substep`):

    L = chol(M);  a_free = M⁻¹(τ−bias);  v_free = v + dt·a_free
    MinvJT = M⁻¹Jᵀ;  A = J·MinvJT + reg·I;  rhs = target − J·v_free
    λ = PGS(A, rhs);  v⁺ = v_free + MinvJT·λ

Under `vmap`, XLA executes this as hundreds of tiny ops on (B, n, n)
arrays whose minor (n, n) dims badly underfill the (8, 128) vector
registers (n ≈ 18–36 vs 128 lanes). The kernel here flips the layout:
**batch lives on the lane dimension** — every matrix element is a
(S, 128)-shaped vector of envs — so each of the ~15·n chain steps is a
full-width VPU op and every intermediate (L, X, A, λ) stays in VMEM for
the whole chain instead of round-tripping through HBM between XLA ops.

Reference behavior: jiminy's `PGSSolver::SolveBoxedForwardDynamics`
(SURVEY.md §2.1 "Constraint solver"); the math here is bit-compatible
with engine/solver.py `pgs_solve_grouped` (same sweep order: equality
rows → bounds group → per-color contact updates with friction-cone
projection) and math/linalg.py's factorization, validated by
tests/test_pallas_solve.py.

Hazard note: the TPU backend's shared-index gather miscompilation
(docs/tpu_performance.md) does not apply here — the kernel uses static
slices only — but keep any new indexing static all the same.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.solver import BlockSpec, kkt_residual, pgs_solve_grouped
from jiminy_tpu.math import linalg

LANES = 128
# Mosaic stack estimate budget. The kernel raises the scoped-vmem cap to
# 100 MB (v5e has 128 MB physical VMEM); the estimator under-counts
# Mosaic's imperfect stack-slot reuse by ~2.5×, hence the low threshold.
# Overridable for on-device lane-utilization experiments: at 36 MB the
# Atlas-size problem (n=29, nc=47) picks S=4; ~70 MB would admit S=8
# (2× the per-instruction VPU rows) IF the real footprint fits — verify
# on hardware before changing the default.
try:
    _VMEM_BUDGET = int(
        os.environ.get("JIMINY_TPU_VMEM_BUDGET", 36 * 1024 * 1024)
    )
except ValueError as e:
    raise ValueError(
        "JIMINY_TPU_VMEM_BUDGET must be a plain integer byte count "
        f"(e.g. 73400320), got {os.environ['JIMINY_TPU_VMEM_BUDGET']!r}"
    ) from e


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Static shape/solver description (hashable — used as a trace key)."""

    n: int  # velocity dimension nv
    nc: int  # stacked constraint rows
    dt: float
    eq_blocks: tuple  # tuple of BlockSpec("equality", start, size)
    bounds_span: tuple | None  # (start, size) of contiguous λ≥0 rows
    contact_colors: tuple  # ((start, n_contacts), ...) rows = k×[t1,t2,n]
    iters: int = 8
    relax: float = 1.0
    reg: float = 1e-6
    compute_residual: bool = False


# --------------------------------------------------------------------------
# Reference path (pure XLA, per-env) — also the custom_vmap fallback.
# --------------------------------------------------------------------------
def solve_reference(cfg: SolveConfig, M, p, v, J, target, mu, active, lam0):
    """Single-env chain, identical to the engine's inline XLA version."""
    L = linalg.cholesky(M)
    a_free = linalg.cho_solve(L, p)
    v_free = v + cfg.dt * a_free
    MinvJT = linalg.cho_solve(L, J.T)  # (n, nc)
    A = J @ MinvJT + cfg.reg * jnp.eye(cfg.nc, dtype=M.dtype)
    rhs = target - J @ v_free
    lam, residual = pgs_solve_grouped(
        A,
        rhs,
        mu,
        active,
        eq_blocks=list(cfg.eq_blocks),
        bounds_span=cfg.bounds_span,
        contact_colors=list(cfg.contact_colors),
        iters=cfg.iters,
        relax=cfg.relax,
        lam0=lam0,
        compute_residual=cfg.compute_residual,
    )
    v_next = v_free + MinvJT @ lam
    return v_next, lam, residual


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------
_MAX_SUBLANES_CANDIDATES = (32, 16, 8, 4, 2, 1)
try:
    # experiment knob: >8 packs multiple native (8,128) registers per
    # lane op (fewer grid steps). Measured on v5e (ANYmal bench,
    # round 5): S=16 → 6.0M, S=32 → 5.8M vs 6.4M at S=8 — bigger tiles
    # LOSE (VMEM pressure / pipeline granularity), so the default stays
    # 8; the knob remains for future hardware.
    _MAX_SUBLANES = int(os.environ.get("JIMINY_TPU_MAX_SUBLANES", 8))
except ValueError as e:
    raise ValueError(
        "JIMINY_TPU_MAX_SUBLANES must be an integer (a power of two "
        f"≤ 32), got {os.environ['JIMINY_TPU_MAX_SUBLANES']!r}"
    ) from e


def _pick_sublanes(n: int, nc: int) -> int:
    """Largest S ≤ _MAX_SUBLANES (default 8) whose VMEM working set
    fits the budget.

    Scratch (T, L, X, A) + streamed in/out blocks + the largest transient
    (the rank-1 outer product in the Delassus build), with ~1.5× headroom
    for Mosaic's stack allocator."""
    m = nc + 1
    for s in (c for c in _MAX_SUBLANES_CANDIDATES if c <= _MAX_SUBLANES):
        lanes = s * LANES * 4  # bytes per (S,128) f32 element-vector
        est = lanes * (
            2 * n * n  # T + L scratch
            + n * m  # X scratch
            + nc * nc  # A scratch
            + n * n + n * nc  # streamed M and Jᵀ blocks
            + nc * nc  # Delassus outer-product transient
            + 10 * nc  # λ, rhs, diag, target, mu, active, temps
            + 6 * n
        )
        if est * 3 // 2 <= _VMEM_BUDGET:
            return s
    return 1


def _kernel_body(cfg: SolveConfig, refs):
    """Standalone-kernel wrapper: read lane-major inputs, run the chain,
    write outputs. M must already be written into T_ref by the caller."""
    (m_ref, p_ref, v_ref, jt_ref, tgt_ref, mu_ref, act_ref, lam0_ref,
     vn_ref, lam_ref, res_ref, T_ref, L_ref, X_ref, A_ref) = refs
    T_ref[...] = m_ref[:, :, 0]
    v_next, lam, res = _solve_chain(
        cfg,
        p_ref[:, 0],
        v_ref[:, 0],
        jt_ref[:, :, 0],
        tgt_ref[:, 0],
        mu_ref[:, 0],
        act_ref[:, 0],
        lam0_ref[:, 0],
        T_ref, L_ref, X_ref, A_ref,
    )
    vn_ref[:, 0] = v_next
    lam_ref[:, 0] = lam
    res_ref[0, 0] = res


def _solve_chain(cfg: SolveConfig, pv, vv, Jt, tgt, mu, act, lam0,
                 T_ref, L_ref, X_ref, A_ref):
    """The dense chain on lane-major VALUES: chol(T_ref) → X = M⁻¹[p|Jᵀ]
    → Delassus → grouped PGS → v⁺. The caller has written M into T_ref
    (destroyed). Shapes: pv/vv (n,S,128), Jt (n,nc,S,128), row vectors
    (nc,S,128). Returns (v_next, λ, residual) values. Reused by both the
    standalone constraint kernel and the whole-substep kernel."""
    n, nc = cfg.n, cfg.nc
    dt = jnp.float32(cfg.dt)
    relax = jnp.float32(cfg.relax)
    lam = lam0 * act

    # All large intermediates (trailing block T, factor L, multi-RHS X,
    # Delassus A) live in explicit VMEM scratch and update in place —
    # SSA value chains here make Mosaic stack-allocate every loop
    # iteration's copy and blow the 16 MB VMEM budget.

    # ---- Cholesky, right-looking: one rank-1 trailing update per column
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(T_ref[j, j], 1e-12))
        L_ref[j, j] = d
        if j < n - 1:
            sub = T_ref[j + 1 :, j] / d  # (n-j-1, S, 128)
            L_ref[j + 1 :, j] = sub
            T_ref[j + 1 :, j + 1 :] = (
                T_ref[j + 1 :, j + 1 :] - sub[:, None] * sub[None]
            )

    # ---- one forward+back solve for ALL right-hand sides:
    # X = M⁻¹ [p | Jᵀ]  →  column 0 is a_free, columns 1: are MinvJT
    X_ref[...] = jnp.concatenate([pv[:, None], Jt], axis=1)  # (n, m, S,128)
    # forward: column-update substitution (one FMA per column of L)
    for k in range(n):
        yk = X_ref[k] / L_ref[k, k]  # (m, S, 128)
        X_ref[k] = yk
        if k < n - 1:
            c = L_ref[k + 1 :, k]
            X_ref[k + 1 :] = X_ref[k + 1 :] - c[:, None] * yk[None]
    # backward: Lᵀx = y, reading columns of L (rows of Lᵀ) directly
    for i in range(n - 1, -1, -1):
        s = X_ref[i]
        if i < n - 1:
            c = L_ref[i + 1 :, i]  # Σ_{j>i} L[j,i]·x[j]
            s = s - jnp.sum(c[:, None] * X_ref[i + 1 :], axis=0)
        X_ref[i] = s / L_ref[i, i]
    a_free = X_ref[:, 0]  # (n, S, 128)
    v_free = vv + dt * a_free

    # ---- Delassus A = J·M⁻¹Jᵀ + reg·I and rhs = target − J·v_free
    A_ref[...] = Jt[0][:, None] * X_ref[0, 1:][None]
    for k in range(1, n):
        A_ref[...] = A_ref[...] + Jt[k][:, None] * X_ref[k, 1:][None]
    eye_reg = jnp.float32(cfg.reg)
    diag = jnp.stack([A_ref[i, i] + eye_reg for i in range(nc)], axis=0)
    diag = jnp.maximum(diag, 1e-8)
    inv_diag = 1.0 / diag
    rhs = tgt - jnp.sum(Jt * v_free[:, None], axis=0)  # (nc, S, 128)

    # ---- PGS sweeps (same order/math as pgs_solve_grouped)
    def contract(rows_A, lam):  # rows_A: (r, nc, S, 128) → (r, S, 128)
        return jnp.sum(rows_A * lam[None], axis=1)

    def splice(lam, s, e, vals):  # lam with rows [s:e) replaced, no empties
        parts = [x for x in (lam[:s], vals, lam[e:]) if x.shape[0]]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    def sweep(_, lam):
        for blk in cfg.eq_blocks:
            for i in range(blk.start, blk.start + blk.size):
                r = (
                    rhs[i]
                    - jnp.sum(A_ref[i] * lam, axis=0)
                    - eye_reg * lam[i]
                )
                li = (lam[i] + relax * r * inv_diag[i]) * act[i]
                lam = splice(lam, i, i + 1, li[None])
        if cfg.bounds_span is not None:
            s, k = cfg.bounds_span
            r = (
                rhs[s : s + k]
                - contract(A_ref[s : s + k], lam)
                - eye_reg * lam[s : s + k]
            )
            li = lam[s : s + k] + relax * r * inv_diag[s : s + k]
            li = jnp.maximum(li, 0.0) * act[s : s + k]
            lam = splice(lam, s, s + k, li)
        for s, k in cfg.contact_colors:
            if k == 0:
                continue
            e = s + 3 * k
            A_blk = A_ref[s:e].reshape(k, 3, nc, *lam.shape[1:])

            def rows(x):  # (3k, S, 128) → (k, 3, S, 128)
                return x[s:e].reshape(k, 3, *x.shape[1:])

            def put_rows(lam, j, vals):  # write row-type j of the color
                blk = rows(lam)
                parts = [
                    vals[:, None] if jj == j else blk[:, jj : jj + 1]
                    for jj in range(3)
                ]
                blk = jnp.concatenate(parts, axis=1)
                return splice(
                    lam, s, e, blk.reshape(3 * k, *lam.shape[1:])
                )

            def row_update(lam, j, lo=False):
                r = (
                    rows(rhs)[:, j]
                    - contract(A_blk[:, j], lam)
                    - eye_reg * rows(lam)[:, j]
                )
                li = rows(lam)[:, j] + relax * r * rows(inv_diag)[:, j]
                if lo:
                    li = jnp.maximum(li, 0.0)
                return li * rows(act)[:, j]

            lam = put_rows(lam, 2, row_update(lam, 2, lo=True))  # normals
            lam = put_rows(lam, 0, row_update(lam, 0))
            lam = put_rows(lam, 1, row_update(lam, 1))
            blk = rows(lam)
            tn = jnp.sqrt(blk[:, 0] ** 2 + blk[:, 1] ** 2 + 1e-24)
            lim = rows(mu)[:, 2] * blk[:, 2]
            scale = jnp.where(tn > lim, lim / jnp.maximum(tn, 1e-12), 1.0)
            blk = jnp.concatenate(
                [
                    (blk[:, 0] * scale)[:, None],
                    (blk[:, 1] * scale)[:, None],
                    blk[:, 2:3],
                ],
                axis=1,
            )
            lam = splice(lam, s, e, blk.reshape(3 * k, *lam.shape[1:]))
        return lam

    lam = jax.lax.fori_loop(0, cfg.iters, sweep, lam, unroll=False)

    # ---- velocity update and outputs
    v_next = v_free + jnp.sum(X_ref[:, 1:] * lam[None], axis=1)

    if cfg.compute_residual:
        def splice(x, s, e, vals):
            parts = [y for y in (x[:s], vals, x[e:]) if y.shape[0]]
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

        r = rhs - jnp.sum(A_ref[...] * lam[None], axis=1) - eye_reg * lam
        viol = jnp.abs(r) * act
        # unilateral bounds rows
        if cfg.bounds_span is not None:
            s, k = cfg.bounds_span
            u = jnp.where(
                lam[s : s + k] > 1e-6,
                jnp.abs(r[s : s + k]),
                jnp.maximum(r[s : s + k], 0.0),
            )
            viol = splice(viol, s, s + k, u * act[s : s + k])
        for s, k in cfg.contact_colors:
            if k == 0:
                continue
            e = s + 3 * k
            blk_l = lam[s:e].reshape(k, 3, *lam.shape[1:])
            blk_r = r[s:e].reshape(k, 3, *lam.shape[1:])
            blk_a = act[s:e].reshape(k, 3, *lam.shape[1:])
            n_viol = jnp.where(
                blk_l[:, 2] > 1e-6,
                jnp.abs(blk_r[:, 2]),
                jnp.maximum(blk_r[:, 2], 0.0),
            )
            tn = jnp.sqrt(blk_l[:, 0] ** 2 + blk_l[:, 1] ** 2 + 1e-24)
            sliding = tn >= 0.999 * jnp.maximum(blk_l[:, 2], 1e-9)
            t_viol = jnp.where(sliding[:, None], 0.0, jnp.abs(blk_r[:, :2]))
            blk_v = jnp.concatenate([t_viol, n_viol[:, None]], axis=1)
            viol = splice(
                viol, s, e, (blk_v * blk_a).reshape(3 * k, *lam.shape[1:])
            )
        res = jnp.max(viol, axis=0)
    else:
        res = jnp.zeros_like(v_free[0])
    return v_next, lam, res


def _to_lane_major(x, batch_axis, G, S):
    """(..., B, ...) with batch on `batch_axis` → (*rest, G, S, 128)."""
    x = jnp.moveaxis(x, batch_axis, -1)
    return x.reshape(*x.shape[:-1], G, S, LANES)


@functools.partial(jax.jit, static_argnums=(0, 9))
def solve_batched_pallas(
    cfg: SolveConfig, M, p, v, J, target, mu, active, lam0,
    interpret: bool | None = None,
):
    """Batched chain: M (B,n,n), p/v (B,n), J (B,nc,n), target/mu/active/
    lam0 (B,nc) → (v_next (B,n), λ (B,nc), residual (B,)).

    ``interpret=None`` → compiled on TPU, interpreter elsewhere (CPU CI)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, nc = cfg.n, cfg.nc
    B = M.shape[0]
    S = _pick_sublanes(n, nc)
    tile = S * LANES
    Bp = -(-B // tile) * tile  # pad to a whole number of tiles
    G = Bp // tile
    pad = Bp - B

    f32 = jnp.float32
    M = M.astype(f32)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        M = jnp.concatenate([M, eye], axis=0)
        zn = jnp.zeros((pad, n), f32)
        zc = jnp.zeros((pad, nc), f32)
        p = jnp.concatenate([p.astype(f32), zn], axis=0)
        v = jnp.concatenate([v.astype(f32), zn], axis=0)
        J = jnp.concatenate([J.astype(f32), jnp.zeros((pad, nc, n), f32)], 0)
        target = jnp.concatenate([target.astype(f32), zc], axis=0)
        mu = jnp.concatenate([mu.astype(f32), zc], axis=0)
        active = jnp.concatenate([active.astype(f32), zc], axis=0)
        lam0 = jnp.concatenate([lam0.astype(f32), zc], axis=0)

    Mb = _to_lane_major(M, 0, G, S)  # (n, n, G, S, 128)
    pb = _to_lane_major(p.astype(f32), 0, G, S)  # (n, G, S, 128)
    vb = _to_lane_major(v.astype(f32), 0, G, S)
    # J (B, nc, n) → lane-major Jᵀ (n, nc, G, S, 128)
    Jtb = _to_lane_major(jnp.swapaxes(J.astype(f32), 1, 2), 0, G, S)
    tb = _to_lane_major(target.astype(f32), 0, G, S)
    mb = _to_lane_major(mu.astype(f32), 0, G, S)
    ab = _to_lane_major(active.astype(f32), 0, G, S)
    lb = _to_lane_major(lam0.astype(f32), 0, G, S)

    def mk_spec(*lead):
        block = (*lead, 1, S, LANES)
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            block,
            lambda g, _z=zeros: (*_z, g, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_shape = (
        jax.ShapeDtypeStruct((n, G, S, LANES), f32),
        jax.ShapeDtypeStruct((nc, G, S, LANES), f32),
        jax.ShapeDtypeStruct((1, G, S, LANES), f32),
    )
    vn, lam, res = pl.pallas_call(
        lambda *refs: _kernel_body(cfg, refs),
        grid=(G,),
        in_specs=[
            mk_spec(n, n),
            mk_spec(n),
            mk_spec(n),
            mk_spec(n, nc),
            mk_spec(nc),
            mk_spec(nc),
            mk_spec(nc),
            mk_spec(nc),
        ],
        out_specs=(mk_spec(n), mk_spec(nc), mk_spec(1)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, S, LANES), f32),  # T (chol trailing block)
            pltpu.VMEM((n, n, S, LANES), f32),  # L
            pltpu.VMEM((n, nc + 1, S, LANES), f32),  # X = M⁻¹[p|Jᵀ]
            pltpu.VMEM((nc, nc, S, LANES), f32),  # A (Delassus)
        ],
        # Mosaic's stack allocator does not fully reuse slots across the
        # unrolled chain; the default 16 MB scoped-vmem cap rejects
        # humanoid-size problems even though the true live set is ~5 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(Mb, pb, vb, Jtb, tb, mb, ab, lb)

    def from_lane_major(x):  # (d, G, S, 128) → (B, d)
        d = x.shape[0]
        return x.reshape(d, Bp).T[:B]

    return (
        from_lane_major(vn),
        from_lane_major(lam),
        from_lane_major(res)[:, 0],
    )


# --------------------------------------------------------------------------
# custom_vmap wrapper: per-env code in the engine stays unchanged; `vmap`
# swaps in the lane-major kernel.
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def make_constraint_solver(cfg: SolveConfig, interpret: bool | None = None):
    """(M, p, v, J, target, mu, active, lam0) → (v_next, λ, residual).

    Unbatched: the XLA reference chain. Under `jax.vmap`: the Pallas
    lane-major kernel (inputs must all be batched on the mapped axis)."""

    @jax.custom_batching.custom_vmap
    def solve(M, p, v, J, target, mu, active, lam0):
        return solve_reference(
            cfg, M, p, v, J, target, mu, active.astype(jnp.bool_), lam0
        )

    @solve.def_vmap
    def _rule(axis_size, in_batched, M, p, v, J, target, mu, active, lam0):
        args = [M, p, v, J, target, mu, active, lam0]
        for i, (a, batched) in enumerate(zip(args, in_batched)):
            if not batched:
                args[i] = jnp.broadcast_to(a[None], (axis_size, *a.shape))
        M, p, v, J, target, mu, active, lam0 = args
        out = solve_batched_pallas(
            cfg, M, p, v, J, target, mu.astype(jnp.float32),
            active.astype(jnp.float32), lam0, interpret,
        )
        return out, (True, True, True)

    return solve
