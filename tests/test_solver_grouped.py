"""Grouped (static-slice) PGS vs the row-sequential reference solver.

Context: the first grouped implementation addressed rows via index-array
gathers, which the TPU backend miscompiles when several gathers share one
index vector (r/diag lowered to x/x ≈ 1) — silently corrupting every
TPU-side contact solve. The rewrite uses static slices only; these tests
pin its fixed point to the trusted sequential solver."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.solver import BlockSpec, pgs_solve, pgs_solve_grouped


def _system(key, n_bounds=6, n_contacts=4, nv=12):
    k1, k2, k3 = jax.random.split(key, 3)
    nc = n_bounds + 3 * n_contacts
    G = jax.random.normal(k1, (nc, nv))
    A = G @ G.T + 0.5 * jnp.eye(nc)
    b = 3.0 * jax.random.normal(k2, (nc,))
    active = jax.random.bernoulli(k3, 0.8, (nc,))
    mu = jnp.concatenate([jnp.zeros(n_bounds), jnp.full(3 * n_contacts, 0.8)])
    return A, b, mu, active, n_bounds, n_contacts


class TestGroupedSolver:
    def test_matches_sequential_without_coupling(self):
        """With block-diagonal A (no cross coupling) grouped and sequential
        solvers share the exact fixed point."""
        n_bounds, n_contacts = 4, 4
        nc = n_bounds + 3 * n_contacts
        key = jax.random.PRNGKey(0)
        # block-diagonal: bounds diagonal + independent 3×3 contact blocks
        A = jnp.eye(nc) * 2.0
        for c in range(n_contacts):
            s = n_bounds + 3 * c
            G = jax.random.normal(jax.random.fold_in(key, c), (3, 3))
            A = A.at[s : s + 3, s : s + 3].set(G @ G.T + 2.0 * jnp.eye(3))
        b = 2.0 * jax.random.normal(key, (nc,))
        active = jnp.ones(nc, bool)
        mu = jnp.concatenate([jnp.zeros(n_bounds), jnp.full(3 * n_contacts, 0.8)])

        blocks = [
            BlockSpec("lower", i, 1) for i in range(n_bounds)
        ] + [
            BlockSpec("contact", n_bounds + 3 * c, 3)
            for c in range(n_contacts)
        ]
        lam_seq, _ = pgs_solve(A, b, blocks, mu, active, iters=100)
        colors = [(n_bounds, 2), (n_bounds + 6, 2)]
        lam_grp, _ = pgs_solve_grouped(
            A, b, mu, active, eq_blocks=[], bounds_span=(0, n_bounds),
            contact_colors=colors, iters=100,
        )
        np.testing.assert_allclose(
            np.asarray(lam_seq), np.asarray(lam_grp), atol=1e-4
        )

    def test_converges_on_coupled_system(self):
        """On a generic SPD system both solvers satisfy the same KKT-style
        conditions (complementarity within tolerance)."""
        A, b, mu, active, n_bounds, n_contacts = _system(jax.random.PRNGKey(1))
        lam, res = pgs_solve_grouped(
            A, b, mu, active, eq_blocks=[], bounds_span=(0, n_bounds),
            contact_colors=[(n_bounds, 2), (n_bounds + 6, 2)], iters=300,
        )
        lam = np.asarray(lam)
        r = np.asarray(b - A @ jnp.asarray(lam))
        act = np.asarray(active)
        # bound rows: λ ≥ 0, and r ≤ 0 where λ == 0, r ≈ 0 where λ > 0
        for i in range(n_bounds):
            if not act[i]:
                assert lam[i] == 0.0
                continue
            assert lam[i] >= -1e-6
            if lam[i] > 1e-5:
                assert abs(r[i]) < 1e-3
            else:
                assert r[i] < 1e-3
        # contacts: normal ≥ 0; tangents inside the cone
        for c in range(n_contacts):
            s = n_bounds + 3 * c
            if not act[s + 2]:
                continue
            ln = lam[s + 2]
            assert ln >= -1e-6
            assert np.hypot(lam[s], lam[s + 1]) <= 0.8 * ln + 1e-4

    def test_inactive_rows_stay_zero(self):
        A, b, mu, active, n_bounds, n_contacts = _system(jax.random.PRNGKey(2))
        lam, _ = pgs_solve_grouped(
            A, b, mu, active, eq_blocks=[], bounds_span=(0, n_bounds),
            contact_colors=[(n_bounds, 2), (n_bounds + 6, 2)], iters=50,
        )
        lam = np.asarray(lam)
        assert np.all(lam[~np.asarray(active)] == 0.0)

    def test_under_vmap_and_jit(self):
        keys = jax.random.split(jax.random.PRNGKey(3), 16)
        systems = jax.vmap(_system)(keys)
        A, b, mu, active = systems[0], systems[1], systems[2], systems[3]

        @jax.jit
        @jax.vmap
        def solve(A, b, mu, active):
            lam, res = pgs_solve_grouped(
                A, b, mu, active, eq_blocks=[], bounds_span=(0, 6),
                contact_colors=[(6, 2), (12, 2)], iters=50,
            )
            return lam

        lam = solve(A, b, mu, active)
        assert bool(jnp.all(jnp.isfinite(lam)))
        # spot-check one against the single-sample path
        lam0, _ = pgs_solve_grouped(
            A[0], b[0], mu[0], active[0], eq_blocks=[], bounds_span=(0, 6),
            contact_colors=[(6, 2), (12, 2)], iters=50,
        )
        np.testing.assert_allclose(
            np.asarray(lam[0]), np.asarray(lam0), atol=1e-5
        )
