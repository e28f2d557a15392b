"""Telemetry log round-trips (native codec + Python fallback + HDF5),
Simulator facade, plotting, terrain & random processes."""

import numpy as np
import pytest

from jiminy_tpu.telemetry import TelemetryLog, read_log, stack_log


def _sample_log():
    t = np.linspace(0, 1, 50, dtype=np.float32)
    return stack_log(
        t,
        {"q": np.stack([np.sin(t), np.cos(t)], 1), "energy": t * 2.0},
        constants={"robot_name": "toy", "nq": 2},
    )


class TestTelemetryLog:
    def test_stack_expands_vector_channels(self):
        log = _sample_log()
        assert set(log.columns) == {"time", "q.0", "q.1", "energy"}
        assert len(log) == 50

    def test_binary_roundtrip_native(self, tmp_path):
        from jiminy_tpu.native import load_codec

        assert load_codec() is not None, "native codec failed to build"
        log = _sample_log()
        p = tmp_path / "log.jtpu"
        log.write_binary(p)
        back = TelemetryLog.read_binary(p)
        assert back.constants["robot_name"] == "toy"
        for k in log.columns:
            np.testing.assert_array_equal(back.columns[k], log.columns[k])

    def test_python_fallback_is_byte_identical(self, tmp_path):
        import jiminy_tpu.native as native

        log = _sample_log()
        p1 = tmp_path / "native.jtpu"
        p2 = tmp_path / "python.jtpu"
        log.write_binary(p1)
        lib, native._LIB, native._LIB_FAILED = native._LIB, None, True
        try:
            log.write_binary(p2)
        finally:
            native._LIB, native._LIB_FAILED = lib, False
        assert p1.read_bytes() == p2.read_bytes()

    def test_hdf5_roundtrip(self, tmp_path):
        log = _sample_log()
        p = tmp_path / "log.h5"
        log.write_hdf5(p)
        back = TelemetryLog.read_hdf5(p)
        for k in log.columns:
            np.testing.assert_array_equal(back.columns[k], log.columns[k])

    def test_read_log_sniffs_format(self, tmp_path):
        log = _sample_log()
        log.write_binary(tmp_path / "a.jtpu")
        log.write_hdf5(tmp_path / "a.h5")
        assert len(read_log(tmp_path / "a.jtpu")) == 50
        assert len(read_log(tmp_path / "a.h5")) == 50

    def test_append_rows_native(self, tmp_path):
        import ctypes

        from jiminy_tpu.native import load_codec

        lib = load_codec()
        log = _sample_log()
        p = tmp_path / "log.jtpu"
        log.write_binary(p)
        names, data = log.as_matrix()
        extra = np.ones((5, data.shape[1]), np.float32)
        rc = lib.jtpu_append_rows(
            str(p).encode(),
            extra.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            5,
            data.shape[1],
        )
        assert rc == 0
        back = TelemetryLog.read_binary(p)
        assert len(back) == 55
        np.testing.assert_array_equal(back.columns["energy"][-5:], 1.0)


class TestSimulator:
    def test_simulate_pendulum_with_log(self, tmp_path):
        import jax.numpy as jnp

        from jiminy_tpu.engine.engine import EngineOptions
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_pendulum
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator

        sim = Simulator(
            Robot(make_pendulum(), name="pendulum"),
            options=EngineOptions(dt=1e-3),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        final, log = sim.simulate(1.0, q0=jnp.array([0.5]))
        assert len(log) == 1000
        assert "q.0" in log.columns and "energy_kinetic" in log.columns
        # energy bounded (passive pendulum)
        e = log.columns["energy_kinetic"] + log.columns["energy_potential"]
        assert abs(e[-1] - e[0]) < 0.05
        # logs round-trip with constants
        log.write_binary(tmp_path / "run.jtpu")
        back = read_log(tmp_path / "run.jtpu")
        assert back.constants["robot_name"] == "pendulum"
        assert "joint_names" in back.constants

    def test_options_toml_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from jiminy_tpu.engine.engine import EngineOptions
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_pendulum
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator

        sim = Simulator(
            Robot(make_pendulum()),
            options=EngineOptions(dt=2e-3, pgs_iters=11),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        p = tmp_path / "options.toml"
        sim.export_options(p)
        sim2 = Simulator(
            Robot(make_pendulum()), ground=FlatGround(height=jnp.float32(-10.0))
        )
        sim2.import_options(p)
        assert sim2.engine.options.dt == 2e-3
        assert sim2.engine.options.pgs_iters == 11

    def test_plot_and_html_export(self, tmp_path):
        import jax.numpy as jnp

        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_pendulum
        from jiminy_tpu.plot import export_html, plot_log
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator

        sim = Simulator(
            Robot(make_pendulum()),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        _, log = sim.simulate(0.2, q0=jnp.array([0.5]))
        figs = plot_log(log, save_path=tmp_path / "figs")
        assert (tmp_path / "figs" / "q.png").exists()
        export_html(log, tmp_path / "report.html")
        html = (tmp_path / "report.html").read_text()
        assert "svg" in html and "robot_name" in html


class TestTerrain:
    def test_perlin_ground_reproducible_and_queryable(self):
        import jax.numpy as jnp

        from jiminy_tpu.engine.terrain import perlin_ground

        g1 = perlin_ground(seed=3, size=2.0, resolution=0.1, amplitude=0.2)
        g2 = perlin_ground(seed=3, size=2.0, resolution=0.1, amplitude=0.2)
        np.testing.assert_array_equal(np.asarray(g1.z), np.asarray(g2.z))
        g3 = perlin_ground(seed=4, size=2.0, resolution=0.1, amplitude=0.2)
        assert not np.array_equal(np.asarray(g1.z), np.asarray(g3.z))
        h, n = g1.query(jnp.array([[0.3, -0.2], [1.0, 1.0]]))
        assert h.shape == (2,) and n.shape == (2, 3)
        assert float(np.abs(np.asarray(g1.z)).max()) <= 0.2 + 1e-6

    def test_flat_spawn_disk(self):
        from jiminy_tpu.engine.terrain import perlin_ground

        g = perlin_ground(seed=1, size=3.0, resolution=0.1, flat_radius=1.0)
        z = np.asarray(g.z)
        xs = np.linspace(-3, 3, z.shape[0])
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        assert np.abs(z[np.sqrt(X**2 + Y**2) < 0.9]).max() < 1e-6

    def test_stairs_and_combinators(self):
        import jax.numpy as jnp

        from jiminy_tpu.engine.terrain import (
            discretize_ground,
            merge_ground,
            stairs_ground,
            sum_ground,
        )

        s = stairs_ground(step_width=0.5, step_height=0.2, n_steps=4, size=3.0)
        h0, _ = s.query(jnp.array([-1.0, 0.0]))
        h1, _ = s.query(jnp.array([0.6, 0.0]))  # mid second step
        h2, _ = s.query(jnp.array([2.9, 0.0]))  # plateau
        assert float(h0) == 0.0
        assert abs(float(h1) - 0.2) < 0.21  # within one step (interp edge)
        assert abs(float(h2) - 0.8) < 1e-6
        both = sum_ground(s, s)
        assert abs(float(both.query(jnp.array([2.9, 0.0]))[0]) - 1.6) < 1e-6
        m = merge_ground(s, s)
        np.testing.assert_array_equal(np.asarray(m.z), np.asarray(s.z))
        d = discretize_ground(s, 0.2)
        assert set(np.round(np.unique(np.asarray(d.z)) / 0.2).astype(int)) <= {
            0, 1, 2, 3, 4,
        }


class TestRandomProcesses:
    def test_pcg32_reference_stream(self):
        from jiminy_tpu.utils.random import PCG32

        rng = PCG32(42, 54)
        got = [rng.uint32() for _ in range(6)]
        assert got == [
            0xA15C02B7, 0x7B47F409, 0xBA1D3330,
            0x83D2F293, 0xBFA4784B, 0xCBED606E,
        ]

    def test_periodicity(self):
        from jiminy_tpu.utils.random import (
            PeriodicFourierProcess,
            PeriodicGaussianProcess,
        )

        t = np.linspace(0, 4, 400, endpoint=False)
        f = PeriodicGaussianProcess(1, wavelength=0.3, period=2.0)(t)
        assert np.allclose(f[:200], f[200:], atol=1e-9)
        ff = PeriodicFourierProcess(2, period=1.0)(t)
        assert np.allclose(ff[:100], ff[100:200], atol=1e-9)

    def test_perlin_smooth_and_bounded(self):
        from jiminy_tpu.utils.random import PerlinNoise

        p = PerlinNoise(0)
        x = np.linspace(0, 10, 2000)
        y = p(x)
        assert np.abs(y).max() <= 1.0
        assert np.abs(np.diff(y)).max() < 0.02  # continuous
        p2 = PerlinNoise(0, period=4)
        y2 = p2(x)
        yp = p2(x + 4.0)
        np.testing.assert_allclose(y2, yp, atol=1e-9)
