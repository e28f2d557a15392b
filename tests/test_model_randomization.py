"""Per-env model/inertial domain randomization (reference: model
randomization hooks over the dynamic parameters, SURVEY.md §2.1 "Model":
mass, CoM, inertia, armature, motor gains/friction, sensor calibration).
Complements test_domain_randomization.py (contact params + terrain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.engine import (
    Engine,
    EngineOptions,
    ModelParams,
    ModelRandomization,
)
from jiminy_tpu.models.toys import make_double_pendulum


@pytest.fixture(scope="module")
def pend():
    tree = make_double_pendulum()
    eng = Engine(tree, EngineOptions(dt=1e-3, contact_model="constraint"))
    return tree, eng


def _roll(eng, tree, mp, n=200, u=None):
    st = eng.reset(q=tree.neutral_q().at[0].set(0.7))
    tau = jnp.zeros(tree.nv) if u is None else u
    step = jax.jit(
        lambda s: eng.step(s, tau, n_substeps=n, model_params=mp)
    )
    return step(st)


class TestModelParams:
    def test_nominal_is_identity(self, pend):
        """Identity params must reproduce the unrandomized trajectory
        EXACTLY (same program modulo no-op scales)."""
        tree, eng = pend
        ref = _roll(eng, tree, None)
        nom = _roll(eng, tree, ModelParams.nominal(tree))
        np.testing.assert_allclose(
            np.asarray(nom.q), np.asarray(ref.q), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(nom.v), np.asarray(ref.v), atol=1e-5
        )

    def test_mass_scale_changes_trajectory(self, pend):
        """A heavier distal link responds measurably less to the same
        applied torque (the VERDICT r3 done-criterion: per-env mass
        changes change trajectories). Driven, because a FREE pendulum's
        swing is mass-invariant (gravity and inertia scale together)."""
        tree, eng = pend
        u = jnp.array([0.5, 0.0])
        ref = _roll(eng, tree, None, n=1000, u=u)
        mp = ModelParams.nominal(tree).replace(
            mass_scale=jnp.array([1.0, 1.6])
        )
        out = _roll(eng, tree, mp, n=1000, u=u)
        assert float(jnp.max(jnp.abs(out.q - ref.q))) > 1e-2
        assert bool(jnp.all(jnp.isfinite(out.q)))

    def test_com_offset_parallel_axis_consistency(self, pend):
        """Shifting the CoM keeps the model physical: the mass matrix
        stays PSD (Cholesky finite) and energy stays bounded."""
        tree, _ = pend
        mp = ModelParams.nominal(tree).replace(
            com_offset=jnp.full((tree.nb, 3), 0.05)
        )
        tree2 = mp.apply_to_tree(tree)
        from jiminy_tpu.core import algos

        M = algos.crba(tree2, tree2.neutral_q())
        # PSD: all eigenvalues positive
        w = np.linalg.eigvalsh(np.asarray(M, np.float64))
        assert w.min() > 0
        # and first moment is consistent: h = m·(c + d)
        m = np.asarray(tree.inertia_mass)
        h0 = np.asarray(tree.inertia_h)
        h2 = np.asarray(tree2.inertia_h)
        np.testing.assert_allclose(
            h2, h0 + m[:, None] * 0.05, rtol=1e-5, atol=1e-7
        )

    def test_batched_per_env_params_diverge(self, pend):
        """One compiled program, per-env leaves: different masses under
        vmap give different trajectories."""
        tree, eng = pend
        B = 3
        scales = jnp.array([0.7, 1.0, 1.4])
        mp = jax.vmap(
            lambda s: ModelParams.nominal(tree).replace(
                mass_scale=jnp.array([1.0, 1.0]) * s
            )
        )(scales)
        q0 = jnp.tile(tree.neutral_q().at[0].set(0.7), (B, 1))
        states = jax.vmap(lambda q: eng.reset(q=q))(q0)
        u = jnp.array([0.5, 0.0])  # driven: free swing is mass-invariant
        step = jax.jit(
            jax.vmap(
                lambda s, p: eng.step(
                    s, u, n_substeps=500, model_params=p
                )
            )
        )
        out = step(states, mp)
        q = np.asarray(out.q)
        assert np.abs(q[0] - q[1]).max() > 1e-3
        assert np.abs(q[1] - q[2]).max() > 1e-3

    def test_motor_gain_scales_torque(self, pend):
        tree, _ = pend
        from jiminy_tpu.hardware.motors import Motors

        motors = Motors.create(v_idx=(0, 1), reduction=2.0)
        mp = ModelParams.nominal(tree, motors).replace(
            motor_gain=jnp.array([0.5, 2.0])
        )
        m2 = mp.apply_to_motors(motors)
        u = jnp.array([1.0, 1.0])
        v = jnp.zeros(tree.nv)
        tau0 = motors.compute_effort(u, v)
        tau2 = m2.compute_effort(u, v)
        np.testing.assert_allclose(
            np.asarray(tau2[:2]), np.asarray(tau0[:2] * jnp.array([0.5, 2.0])),
            rtol=1e-6,
        )


class TestWalkerRandomization:
    def test_anymal_info_carries_params_and_alters_dynamics(self):
        """End-to-end: the env samples per-episode params into info and
        trajectories depend on them."""
        from jiminy_tpu.envs.anymal import ANYmalEnv

        env_r = ANYmalEnv(observe="state", 
            model_randomization=ModelRandomization(
                mass_scale=(0.5, 0.5),  # degenerate range → deterministic
            )
        )
        env_n = ANYmalEnv(observe="state")
        key = jax.random.PRNGKey(0)
        st_r = jax.jit(env_r.reset)(key)
        st_n = jax.jit(env_n.reset)(key)
        assert "model_params" in st_r.info
        act = jnp.zeros(env_r.action_size)
        step_r = jax.jit(env_r.step_no_reset)
        step_n = jax.jit(env_n.step_no_reset)
        for _ in range(3):
            st_r = step_r(st_r, act)
            st_n = step_n(st_n, act)
        # half the mass → visibly different motion after 3 steps
        assert float(jnp.max(jnp.abs(st_r.sim.q - st_n.sim.q))) > 1e-3
        assert bool(jnp.all(jnp.isfinite(st_r.sim.q)))

    def test_sensor_bias_offsets_shift_readings(self):
        from jiminy_tpu.envs.anymal import ANYmalEnv

        env = ANYmalEnv(
            observe="sensors",
            model_randomization=ModelRandomization(
                mass_scale=(1.0, 1.0),
                com_offset=0.0,
                inertia_scale=(1.0, 1.0),
                motor_gain=(1.0, 1.0),
                sensor_bias=0.1,
            ),
        )
        key = jax.random.PRNGKey(3)
        st = jax.jit(env.reset)(key)
        assert "sensor_bias" in st.info
        # two resets with different keys → different calibration offsets
        st2 = jax.jit(env.reset)(jax.random.PRNGKey(4))
        d = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(st.info["sensor_bias"], st2.info["sensor_bias"])
        )
        assert d > 1e-4
