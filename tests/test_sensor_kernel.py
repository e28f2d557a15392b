"""In-kernel sensor stage vs the chunked XLA fallback.

The fused multi-substep kernel measures (IMU/encoder/effort/contact),
corrupts with PRE-SAMPLED noise and ring-pushes the delay lines every
k_obs substeps inside ONE launch (ops/substep_kernel._sensor_stage;
reference: sensor refresh at its own period inside the stepper loop,
SURVEY.md §3.1, §2.7 item 4). The fallback path splits the step into
n_obs_updates launches + an XLA measurement cloud. Both paths use the
SAME key tree (SensorSuite.sample_eps mirrors _corrupt), so buffers and
observations must agree to f32 reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.engine.engine import EngineOptions


def _env(observe_kw=None, **opt_kw):
    from jiminy_tpu.envs import ANYmalEnv

    opts = EngineOptions(
        dt=5e-3, contact_model="constraint",
        constraint_solver="pallas_substep", pgs_iters=8,
        compute_solver_residual=False, **opt_kw,
    )
    return ANYmalEnv(
        step_dt=0.02, sim_dt=5e-3, observe="sensors",
        engine_options=opts, max_steps=50, **(observe_kw or {}),
    )


class TestSensorKernel:
    def test_fused_matches_fallback(self):
        """Same keys → identical noise realization → the fused path's
        buffers/obs/state must match the chunked fallback."""
        env = _env({"sensor_delay": 5e-3, "imu_noise": 0.02,
                    "encoder_noise": 0.005})
        assert env._fused_sensors  # the kernel variant is engaged
        B = 3
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states = jax.jit(jax.vmap(env.reset))(keys)
        a = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, 12))

        out_fused = jax.jit(jax.vmap(env.step_no_reset))(states, a)
        env._fused_sensors = False  # force the XLA fallback
        out_ref = jax.jit(jax.vmap(env.step_no_reset))(states, a)
        env._fused_sensors = True

        np.testing.assert_allclose(
            out_fused.sim.q, out_ref.sim.q, atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            out_fused.sim.v, out_ref.sim.v, atol=2e-2, rtol=1e-2
        )
        for bf, br in zip(
            out_fused.info["sensor_bufs"], out_ref.info["sensor_bufs"]
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(br))))
            np.testing.assert_allclose(
                np.asarray(bf) / scale, np.asarray(br) / scale,
                atol=5e-3,
            )
        np.testing.assert_allclose(
            out_fused.obs, out_ref.obs, atol=5e-3, rtol=1e-2
        )
        # buffers actually advanced (new sample ≠ reset fill)
        b0 = states.info["sensor_bufs"][0]
        b1 = out_fused.info["sensor_bufs"][0]
        assert float(jnp.max(jnp.abs(b1 - b0))) > 1e-4

    @pytest.mark.slow  # interpret-mode Pallas: minutes on CPU
    def test_fused_respects_delay_interpolation(self):
        """A one-period delay must shift the encoder reading exactly one
        update back — the ring ordering in-kernel matches the reader."""
        env = _env({"sensor_delay": 5e-3})
        assert env._fused_sensors
        key = jax.random.PRNGKey(3)
        st = jax.jit(env.reset)(key)
        a = jnp.ones(12) * 0.5
        s1 = jax.jit(env.step_no_reset)(st, a)
        # delayed read == slot-1 of the buffer (delay = 1 period, no
        # fractional part)
        enc_group = next(
            i for i, g in enumerate(env.sensors.groups)
            if g.type == "encoder"
        )
        buf = s1.info["sensor_bufs"][enc_group]
        readings = env.sensors.read(s1.info["sensor_bufs"])
        np.testing.assert_allclose(
            np.asarray(readings["encoder"]), np.asarray(buf[:, 1]),
            atol=1e-6,
        )

    def test_fused_k_obs2_matches_fallback(self):
        """k_obs > 1: the in-kernel stage measures every substep but
        COMMITS only on obs boundaries (where-mask + eps shift). Ant's
        suite samples at 2× its physics step — fused must equal the
        chunked fallback exactly there too (an artifact trained on this
        path can't catch a buffer-timing slip; this A/B can)."""
        from jiminy_tpu.envs import AntEnv

        env = AntEnv(
            observe="sensors", max_steps=20,
            engine_options=EngineOptions(
                dt=2.5e-3, contact_model="constraint",
                constraint_solver="pallas_substep", pgs_iters=4,
                compute_solver_residual=False,
            ),
        )
        assert env.n_substeps_per_obs == 2  # the k_obs=2 config
        assert env.n_obs_updates == 10
        assert env._fused_sensors
        key = jax.random.PRNGKey(2)
        st = jax.jit(env.reset)(key)
        a = 0.2 * jax.random.normal(jax.random.PRNGKey(9), (8,))
        out_fused = jax.jit(env.step_no_reset)(st, a)
        env._fused_sensors = False
        out_ref = jax.jit(env.step_no_reset)(st, a)
        env._fused_sensors = True
        np.testing.assert_allclose(
            out_fused.sim.q, out_ref.sim.q, atol=2e-4, rtol=1e-3
        )
        for bf, br in zip(
            out_fused.info["sensor_bufs"], out_ref.info["sensor_bufs"]
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(br))))
            np.testing.assert_allclose(
                np.asarray(bf) / scale, np.asarray(br) / scale,
                atol=5e-3,
            )
        np.testing.assert_allclose(
            out_fused.obs, out_ref.obs, atol=5e-3, rtol=1e-2
        )

    @pytest.mark.slow  # interpret-mode Pallas: minutes on CPU
    def test_fused_randomized_combo(self):
        """Domain randomization + in-kernel sensors together (the full
        sim-to-real training config on one launch)."""
        from jiminy_tpu.engine.randomization import ModelRandomization

        env = _env(
            {
                "imu_noise": 0.02,
                "model_randomization": ModelRandomization(
                    mass_scale=(0.8, 1.2), sensor_bias=0.05
                ),
            }
        )
        assert env._fused_sensors
        B = 2
        keys = jax.random.split(jax.random.PRNGKey(5), B)
        states = jax.jit(jax.vmap(env.reset))(keys)
        a = jnp.zeros((B, 12))
        out_fused = jax.jit(jax.vmap(env.step_no_reset))(states, a)
        env._fused_sensors = False
        out_ref = jax.jit(jax.vmap(env.step_no_reset))(states, a)
        env._fused_sensors = True
        np.testing.assert_allclose(
            out_fused.sim.q, out_ref.sim.q, atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            out_fused.obs, out_ref.obs, atol=5e-3, rtol=1e-2
        )
