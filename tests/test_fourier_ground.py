"""FourierGround: analytic terrain for the in-kernel ground query.

Pins: query matches a numpy reference, normals match finite differences,
the sampled spectrum has the advertised scale, and vmapped sampling gives
distinct per-env terrains (VERDICT r1 missing #7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.ground import FourierGround, sample_fourier_ground


def test_query_matches_numpy_reference():
    g = FourierGround(
        amp=jnp.array([0.1, 0.05]),
        kx=jnp.array([1.0, 3.0]),
        ky=jnp.array([0.5, -2.0]),
        phase=jnp.array([0.3, 1.2]),
    )
    xy = jnp.array([[0.0, 0.0], [1.3, -0.7], [5.0, 2.0]])
    h, n = g.query(xy)
    amp = np.array([0.1, 0.05])
    kx = np.array([1.0, 3.0])
    ky = np.array([0.5, -2.0])
    ph = np.array([0.3, 1.2])
    for i, (x, y) in enumerate(np.asarray(xy)):
        arg = kx * x + ky * y + ph
        np.testing.assert_allclose(
            float(h[i]), np.sum(amp * np.sin(arg)), rtol=1e-5, atol=1e-6
        )
    # finite-difference normal check
    eps = 1e-4
    for i, (x, y) in enumerate(np.asarray(xy)):
        hx1, _ = g.query(jnp.array([x + eps, y]))
        hx0, _ = g.query(jnp.array([x - eps, y]))
        hy1, _ = g.query(jnp.array([x, y + eps]))
        hy0, _ = g.query(jnp.array([x, y - eps]))
        grad = np.array(
            [float(hx1 - hx0) / (2 * eps), float(hy1 - hy0) / (2 * eps)]
        )
        n_ref = np.array([-grad[0], -grad[1], 1.0])
        n_ref /= np.linalg.norm(n_ref)
        np.testing.assert_allclose(np.asarray(n[i]), n_ref, atol=1e-3)
    # unit normals
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-6
    )


def test_sampled_spectrum_scale_and_jit():
    amplitude = 0.12
    g = jax.jit(
        lambda k: sample_fourier_ground(k, n_terms=24, amplitude=amplitude)
    )(jax.random.PRNGKey(0))
    # process std over a wide area ≈ amplitude / sqrt(2)
    xs = jnp.linspace(-20.0, 20.0, 200)
    X, Y = jnp.meshgrid(xs, xs)
    h, _ = g.query(jnp.stack([X.ravel(), Y.ravel()], axis=-1))
    std = float(jnp.std(h))
    assert 0.4 * amplitude < std < 1.2 * amplitude, std


def test_per_env_sampling_distinct():
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    gb = jax.vmap(lambda k: sample_fourier_ground(k, n_terms=8))(keys)
    assert gb.amp.shape == (4, 8)
    h, _ = jax.vmap(lambda g: g.query(jnp.array([1.0, 2.0])))(gb)
    assert float(jnp.std(h)) > 1e-3  # different terrains, different heights
