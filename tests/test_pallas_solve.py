"""Pallas constraint-solve kernel vs the XLA reference chain.

Runs the kernel in interpreter mode on the CPU CI mesh; the math must
match engine/solver.py's pgs_solve_grouped + math/linalg.py bit-for-bit
up to float32 reassociation (atol 1e-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.engine.solver import BlockSpec
from jiminy_tpu.ops import (
    SolveConfig,
    make_constraint_solver,
    solve_batched_pallas,
    solve_reference,
)


def _rand_system(key, B, n, nc, active_p=0.7):
    ks = jax.random.split(key, 8)
    R = jax.random.normal(ks[0], (B, n, n)) * 0.3
    M = R @ jnp.swapaxes(R, 1, 2) + 2.0 * jnp.eye(n)
    p = jax.random.normal(ks[1], (B, n))
    v = jax.random.normal(ks[2], (B, n)) * 0.5
    J = jax.random.normal(ks[3], (B, nc, n)) * 0.5
    target = jax.random.normal(ks[4], (B, nc)) * 0.1
    mu = jnp.broadcast_to(jnp.float32(0.8), (B, nc))
    active = jax.random.bernoulli(ks[5], active_p, (B, nc))
    lam0 = jax.random.normal(ks[6], (B, nc)) * 0.01
    return M, p, v, J, target, mu, active, lam0


CONFIGS = {
    # ANYmal-like: 12 bound rows + 4 contacts in 2 colors
    "anymal": SolveConfig(
        n=18, nc=24, dt=5e-3, eq_blocks=(),
        bounds_span=(0, 12),
        contact_colors=((12, 2), (18, 2)),
        iters=4, relax=1.0, reg=1e-6, compute_residual=True,
    ),
    # Atlas-like: 23 bounds + 8 contacts in 2 colors
    "atlas": SolveConfig(
        n=29, nc=47, dt=2e-3, eq_blocks=(),
        bounds_span=(0, 23),
        contact_colors=((23, 4), (35, 4)),
        iters=4, relax=1.0, reg=1e-6, compute_residual=True,
    ),
    # Cassie-like: 4 equality rows (closed loops) + bounds + contacts
    "cassie": SolveConfig(
        n=22, nc=26, dt=2e-3,
        eq_blocks=(BlockSpec("equality", 0, 4),),
        bounds_span=(4, 10),
        contact_colors=((14, 2), (20, 2)),
        iters=4, relax=0.9, reg=1e-6, compute_residual=False,
    ),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_kernel_matches_reference(name):
    cfg = CONFIGS[name]
    B = 16
    args = _rand_system(jax.random.PRNGKey(0), B, cfg.n, cfg.nc)
    M, p, v, J, target, mu, active, lam0 = args

    vn_ref, lam_ref, res_ref = jax.vmap(
        lambda *a: solve_reference(cfg, *a)
    )(M, p, v, J, target, mu, active, lam0)

    vn, lam, res = solve_batched_pallas(
        cfg, M, p, v, J, target, mu.astype(jnp.float32),
        active.astype(jnp.float32), lam0, True,
    )
    np.testing.assert_allclose(vn, vn_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(lam, lam_ref, atol=2e-4, rtol=1e-3)
    if cfg.compute_residual:
        np.testing.assert_allclose(res, res_ref, atol=2e-4, rtol=1e-3)


# tiny config for edge-case tests: the logic under test (padding,
# inactive rows, vmap dispatch) is size-independent, and interpret-mode
# runtime scales with the kernel's op count, not the batch
TINY = SolveConfig(
    n=6, nc=9, dt=5e-3, eq_blocks=(),
    bounds_span=(0, 3),
    contact_colors=((3, 1), (6, 1)),
    iters=4, relax=1.0, reg=1e-6, compute_residual=True,
)


def test_padding_path():
    """B not a multiple of the lane tile exercises the pad/unpad logic."""
    cfg = TINY
    B = 130
    args = _rand_system(jax.random.PRNGKey(1), B, cfg.n, cfg.nc)
    M, p, v, J, target, mu, active, lam0 = args
    vn_ref, lam_ref, _ = jax.vmap(lambda *a: solve_reference(cfg, *a))(
        M, p, v, J, target, mu, active, lam0
    )
    vn, lam, _ = solve_batched_pallas(
        cfg, M, p, v, J, target, mu.astype(jnp.float32),
        active.astype(jnp.float32), lam0, True,
    )
    assert vn.shape == (B, cfg.n)
    np.testing.assert_allclose(vn, vn_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(lam, lam_ref, atol=2e-4, rtol=1e-3)


def test_custom_vmap_wrapper():
    """vmap of the solver dispatches to the kernel; unbatched falls back."""
    cfg = TINY
    solver = make_constraint_solver(cfg, True)
    B = 8
    args = _rand_system(jax.random.PRNGKey(2), B, cfg.n, cfg.nc)
    M, p, v, J, target, mu, active, lam0 = args

    vn_ref, lam_ref, _ = jax.vmap(lambda *a: solve_reference(cfg, *a))(
        M, p, v, J, target, mu, active, lam0
    )
    vn, lam, _ = jax.jit(jax.vmap(solver))(
        M, p, v, J, target, mu, active, lam0
    )
    np.testing.assert_allclose(vn, vn_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(lam, lam_ref, atol=2e-4, rtol=1e-3)

    # unbatched call = reference exactly
    one = [a[0] for a in (M, p, v, J, target, mu, active, lam0)]
    vn1, lam1, _ = solver(*one)
    vr, lr, _ = solve_reference(cfg, *one)
    np.testing.assert_allclose(vn1, vr, atol=1e-6)
    np.testing.assert_allclose(lam1, lr, atol=1e-6)


def test_all_inactive_contacts():
    """Fully inactive rows: λ must be exactly 0, v⁺ = v_free."""
    cfg = TINY
    B = 4
    M, p, v, J, target, mu, _, lam0 = _rand_system(
        jax.random.PRNGKey(3), B, cfg.n, cfg.nc
    )
    active = jnp.zeros((B, cfg.nc))
    vn, lam, _ = solve_batched_pallas(
        cfg, M, p, v, J, target, mu.astype(jnp.float32), active, lam0, True
    )
    np.testing.assert_allclose(lam, 0.0, atol=1e-7)
    vn_ref, _, _ = jax.vmap(lambda *a: solve_reference(cfg, *a))(
        M, p, v, J, target, mu, active.astype(bool), lam0
    )
    np.testing.assert_allclose(vn, vn_ref, atol=2e-4, rtol=1e-3)


def test_engine_pallas_backend_matches_xla():
    """Full engine substeps with constraint_solver="pallas" track the XLA
    path on a batch of free boxes dropped onto the ground."""
    from jiminy_tpu.engine.engine import Engine, EngineOptions
    from tests.test_constraints import make_free_box

    tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
    heights = jnp.array([0.15, 0.12, 0.2, 0.11])
    q0 = jnp.tile(tree.neutral_q(), (4, 1)).at[:, 2].set(heights)
    u = jnp.zeros((4, tree.nv))

    outs = {}
    for backend in ("xla", "pallas"):
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=8,
                constraint_solver=backend,
            ),
        )
        states = jax.vmap(lambda q: eng.reset(q=q))(q0)
        step = jax.jit(
            jax.vmap(lambda s, uu: eng.step(s, uu, n_substeps=20))
        )
        outs[backend] = step(states, u)

    np.testing.assert_allclose(
        outs["pallas"].q, outs["xla"].q, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        outs["pallas"].v, outs["xla"].v, atol=1e-3, rtol=1e-3
    )
