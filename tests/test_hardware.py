"""Motor & sensor tests — delay vs hand-shifted signals, bias/noise stats,
analytic IMU values (reference test pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.hardware import (
    Motors,
    SensorSuite,
    contact_spec,
    effort_spec,
    encoder_spec,
    imu_spec,
)
from jiminy_tpu.models.toys import make_free_box, make_pendulum


class TestMotors:
    def test_effort_limit_clamps(self):
        m = Motors.create([0], effort_limit=2.0)
        tau = m.compute_effort(jnp.array([5.0]), jnp.zeros(1))
        assert float(tau[0]) == 2.0
        tau = m.compute_effort(jnp.array([-5.0]), jnp.zeros(1))
        assert float(tau[0]) == -2.0

    def test_reduction_scales_torque(self):
        m = Motors.create([0], reduction=10.0, effort_limit=2.0)
        tau = m.compute_effort(jnp.array([1.5]), jnp.zeros(1))
        assert abs(float(tau[0]) - 15.0) < 1e-6

    def test_viscous_friction_decays_spin(self):
        tree = make_pendulum(damping=0.0)
        motors = Motors.create([0], friction_viscous=0.5)
        engine = Engine(
            tree,
            EngineOptions(dt=1e-3, enable_bounds=False),
            motors=motors,
        )
        # no gravity torque at the bottom? pendulum swings; instead spin a
        # gravity-free pendulum: zero out gravity via horizontal axis trick —
        # simpler: compare against damping-equivalent run
        tree_damped = make_pendulum(damping=0.5)
        engine_d = Engine(tree_damped, EngineOptions(dt=1e-3, enable_bounds=False))
        st = engine.reset(q=jnp.zeros(1), v=jnp.array([3.0]))
        st_d = engine_d.reset(q=jnp.zeros(1), v=jnp.array([3.0]))
        step = jax.jit(
            lambda s: engine.step(s, jnp.zeros(1), n_substeps=500)
        )
        step_d = jax.jit(
            lambda s: engine_d.step(s, jnp.zeros(1), n_substeps=500)
        )
        st, st_d = step(st), step_d(st_d)
        np.testing.assert_allclose(
            float(st.v[0]), float(st_d.v[0]), atol=1e-4
        )

    def test_dry_friction_stops_motion(self):
        m = Motors.create([0], friction_dry=1.0, friction_vel_eps=1e-3)
        tau = m.compute_effort(jnp.zeros(1), jnp.array([1.0]))
        assert abs(float(tau[0]) + 1.0) < 1e-3  # opposes motion
        tau = m.compute_effort(jnp.zeros(1), jnp.array([-1.0]))
        assert abs(float(tau[0]) - 1.0) < 1e-3

    def test_velocity_limit_derates(self):
        m = Motors.create([0], velocity_limit=1.0)
        # pushing further while over the limit → zero torque
        tau = m.compute_effort(jnp.array([5.0]), jnp.array([1.2]))
        assert float(tau[0]) < 0.1
        # braking torque is always allowed
        tau = m.compute_effort(jnp.array([-5.0]), jnp.array([1.2]))
        assert float(tau[0]) == -5.0


class TestSensorDelay:
    def test_encoder_delay_matches_hand_shifted(self):
        """Drive a joint with a known trajectory; a delayed encoder must read
        the signal delayed by exactly d (the reference's interpolated-delay
        contract)."""
        tree = make_pendulum()
        period = 0.01
        d = 0.03  # = 3 periods
        suite = SensorSuite.build(
            tree, [encoder_spec("pivot", delay=d)], period=period
        )
        key = jax.random.PRNGKey(0)
        zeros = jnp.zeros(tree.nv)
        bufs = suite.reset(key, jnp.array([0.0]), zeros)
        qs = []
        for i in range(10):
            qv = jnp.array([float(i)])
            qs.append(float(i))
            bufs = suite.update(
                bufs, key, qv, zeros, zeros, jnp.zeros((tree.ncp, 3)), zeros
            )
            m = suite.read(bufs)["encoder"]
            expect = qs[-4] if i >= 3 else 0.0
            assert abs(float(m[0, 0]) - expect) < 1e-5, (i, m)

    def test_fractional_delay_interpolates(self):
        tree = make_pendulum()
        period = 0.01
        suite = SensorSuite.build(
            tree, [encoder_spec("pivot", delay=0.015)], period=period
        )
        key = jax.random.PRNGKey(0)
        zeros = jnp.zeros(tree.nv)
        bufs = suite.reset(key, jnp.array([0.0]), zeros)
        for i in range(1, 6):
            bufs = suite.update(
                bufs, key, jnp.array([float(i)]), zeros, zeros,
                jnp.zeros((tree.ncp, 3)), zeros,
            )
        # most recent = 5; delay 1.5 periods → halfway between 4 and 3 = 3.5
        m = suite.read(bufs)["encoder"]
        assert abs(float(m[0, 0]) - 3.5) < 1e-5


class TestSensorNoise:
    def test_bias_shifts_mean_noise_sets_std(self):
        tree = make_pendulum()
        suite = SensorSuite.build(
            tree,
            [encoder_spec("pivot", bias=0.5, noise_std=0.1)],
            period=0.01,
        )
        zeros = jnp.zeros(tree.nv)
        samples = []
        bufs = suite.init_buffers()
        for i in range(500):
            key = jax.random.PRNGKey(i)
            bufs = suite.update(
                bufs, key, jnp.zeros(1), zeros, zeros,
                jnp.zeros((tree.ncp, 3)), zeros,
            )
            samples.append(float(suite.read(bufs)["encoder"][0, 0]))
        samples = np.array(samples)
        assert abs(samples.mean() - 0.5) < 0.02
        assert abs(samples.std() - 0.1) < 0.02


class TestImu:
    def _tree_with_imu(self):
        tree = make_pendulum()
        return tree, SensorSuite.build(
            tree, [imu_spec("tip")], period=0.01
        )

    def test_at_rest_reads_gravity(self):
        tree, suite = self._tree_with_imu()
        zeros = jnp.zeros(tree.nv)
        bufs = suite.reset(
            jax.random.PRNGKey(0), jnp.zeros(tree.nq), zeros
        )
        m = suite.read(bufs)["imu"][0]
        quat, gyro, accel = m[:4], m[4:7], m[7:10]
        np.testing.assert_allclose(np.asarray(gyro), 0.0, atol=1e-6)
        # proper acceleration at rest = −g upward = +9.81 on frame z
        np.testing.assert_allclose(
            np.asarray(accel), [0, 0, 9.81], atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(quat), [0, 0, 0, 1], atol=1e-6)

    def test_gyro_reads_joint_rate(self):
        tree, suite = self._tree_with_imu()
        w = 2.0
        a = algos.aba(tree, jnp.zeros(1), jnp.array([w]), jnp.zeros(1))
        bufs = suite.reset(
            jax.random.PRNGKey(0), jnp.zeros(tree.nq), jnp.array([w]), a=a
        )
        m = suite.read(bufs)["imu"][0]
        gyro = m[4:7]
        np.testing.assert_allclose(np.asarray(gyro), [0, w, 0], atol=1e-6)

    def test_centripetal_acceleration(self):
        """Pendulum spinning at rate ω: tip accel includes ω²·L toward the
        pivot (+z in the tip frame) plus the tangential & gravity terms."""
        tree, suite = self._tree_with_imu()
        w, L = 3.0, 1.0
        q, v = jnp.zeros(1), jnp.array([w])
        a = algos.aba(tree, q, v, jnp.zeros(1))
        bufs = suite.reset(jax.random.PRNGKey(0), q, v, a=a)
        m = suite.read(bufs)["imu"][0]
        accel = np.asarray(m[7:10])
        # at θ=0 (hanging down): centripetal = +ω²L (toward pivot = +z), plus
        # static gravity reading +9.81; tangential = α·L on x
        alpha = float(a[0])
        np.testing.assert_allclose(
            accel, [-alpha * L, 0.0, w * w * L + 9.81], atol=1e-4
        )


class TestContactSensor:
    def test_box_rest_forces_sum_to_weight(self):
        tree = make_free_box(mass=2.0)
        engine = Engine(
            tree, EngineOptions(dt=1e-3, contact_model="constraint")
        )
        bottom = [n for n in tree.contact_frame_name if n.endswith("-0.10")]
        assert len(bottom) == 4
        specs = [contact_spec(name) for name in bottom]
        suite = SensorSuite.build(tree, specs, period=0.01)
        st = engine.reset(q=tree.neutral_q().at[2].set(0.1))
        st = jax.jit(
            lambda s: engine.step(s, jnp.zeros(tree.nv), n_substeps=1000)
        )(st)
        a = jnp.zeros(tree.nv)
        bufs = suite.reset(
            jax.random.PRNGKey(0), st.q, st.v, a=a, f_contact=st.contact_forces
        )
        m = suite.read(bufs)["contact"]  # (4, 3) bottom corners
        total_z = float(jnp.sum(m[:, 2]))
        # the bottom 4 corners carry the full weight
        assert abs(total_z - 2.0 * 9.81) < 0.6


class TestEffortSensor:
    def test_reads_commanded_torque(self):
        tree = make_pendulum()
        suite = SensorSuite.build(tree, [effort_spec("pivot")], period=0.01)
        tau = jnp.array([1.7])
        bufs = suite.reset(
            jax.random.PRNGKey(0), jnp.zeros(1), jnp.zeros(1), tau=tau
        )
        m = suite.read(bufs)["effort"]
        assert abs(float(m[0, 0]) - 1.7) < 1e-6
