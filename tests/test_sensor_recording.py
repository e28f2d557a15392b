"""Logged sensor channels must carry the engine's ACCEPTED dynamics.

VERDICT r1 weak #1: Simulator.simulate used to feed a = 0, tau = 0 into
the sensor suite, so logged IMU accelerometers missed the joint-
acceleration contribution and effort sensors always read 0. The engine
now exposes the accepted substep's (a, tau) in SimState; these tests pin
the whole path against the pendulum's closed-form proper acceleration
(reference test style: analytic fixtures, SURVEY.md §4)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.engine import EngineOptions
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.hardware.sensors import SensorSuite, effort_spec, imu_spec
from jiminy_tpu.models.toys import make_pendulum
from jiminy_tpu.robot import Robot
from jiminy_tpu.simulator import Simulator

G = 9.81
L = 1.0


def _pendulum_sim(dt=1e-3):
    tree = make_pendulum(length=L, mass=1.0)
    suite = SensorSuite.build(
        tree,
        [imu_spec("tip"), effort_spec("pivot")],
        period=dt,
    )
    robot = Robot(tree, sensors=suite, name="pendulum")
    return Simulator(
        robot,
        options=EngineOptions(dt=dt),
        ground=FlatGround(height=jnp.float32(-5.0)),  # tip never touches
    )


def _analytic_tip_accel(theta, omega):
    """Proper acceleration of the tip frame (link-local coords) for a
    point-mass pendulum at state (theta, omega): tip p = L(-sin, 0, -cos),
    alpha = -(g/L) sin(theta); measured = R_y(theta)^T (p_ddot - g)."""
    alpha = -(G / L) * np.sin(theta)
    c, s = np.cos(theta), np.sin(theta)
    pdd = np.stack(
        [-L * c * alpha + L * s * omega**2,
         np.zeros_like(theta),
         L * s * alpha + L * c * omega**2],
        axis=-1,
    )
    prop = pdd - np.stack(
        [np.zeros_like(theta), np.zeros_like(theta),
         np.full_like(theta, -G)],
        axis=-1,
    )
    # R_y(t) rows applied as R^T x
    mx = np.stack([c, np.zeros_like(theta), -s], axis=-1)
    mz = np.stack([s, np.zeros_like(theta), c], axis=-1)
    return np.stack(
        [np.sum(mx * prop, -1), prop[..., 1], np.sum(mz * prop, -1)],
        axis=-1,
    )


def _cols(log, prefix, n):
    return np.stack(
        [np.asarray(log.columns[f"{prefix}.{i}"]) for i in range(n)], axis=1
    )


class TestSensorRecording:
    def test_static_pendulum_reads_gravity(self):
        sim = _pendulum_sim()
        _, log = sim.simulate(0.05, q0=jnp.zeros(1), record_sensors=True)
        imu = _cols(log, "sensor_imu", 10)  # (T, 10)
        accel = imu[:, 7:10]
        np.testing.assert_allclose(
            accel, np.tile([0.0, 0.0, G], (accel.shape[0], 1)), atol=1e-4
        )
        gyro = imu[:, 4:7]
        np.testing.assert_allclose(gyro, 0.0, atol=1e-5)

    def test_pendulum_drop_matches_analytic_proper_accel(self):
        dt = 2e-4
        sim = _pendulum_sim(dt=dt)
        _, log = sim.simulate(
            0.4, q0=jnp.array([np.pi / 2]), record_sensors=True
        )
        imu = _cols(log, "sensor_imu", 10)
        theta = np.asarray(log.columns["q.0"])
        omega = np.asarray(log.columns["v.0"])
        expect = _analytic_tip_accel(theta, omega)
        got = imu[:, 7:10]
        # accepted accel is the backward difference over one substep —
        # O(dt) off the instantaneous analytic value
        np.testing.assert_allclose(got, expect, atol=0.03)
        # sanity: the swing actually produced >1 g readings
        assert np.max(np.abs(got[:, 2])) > 1.2 * G

    def test_effort_sensor_logs_applied_torque(self):
        sim = _pendulum_sim()
        u_const = 0.37
        _, log = sim.simulate(
            0.05,
            q0=jnp.zeros(1),
            controller=lambda q, v, t: jnp.array([u_const]),
            record_sensors=True,
        )
        eff = np.asarray(log.columns["sensor_effort.0"])
        np.testing.assert_allclose(eff, u_const, atol=1e-5)
