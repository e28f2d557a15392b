"""Replay viewer + in-kernel PCG32 tests."""

import jax
import jax.numpy as jnp
import numpy as np


class TestViewer:
    def test_replay_html_from_trajectory(self, tmp_path):
        from jiminy_tpu.models.toys import make_double_pendulum
        from jiminy_tpu.viewer import replay_html

        tree = make_double_pendulum()
        ts = np.linspace(0, 2 * np.pi, 50)
        qs = np.stack([np.sin(ts), np.cos(ts)], axis=1)
        p = tmp_path / "replay.html"
        replay_html(tree, qs, p)
        html = p.read_text()
        assert "canvas" in html and '"segments"' in html
        assert html.count("frames") >= 1

    def test_markers_com_and_forces(self, tmp_path):
        """CoM marker always present; force arrows when forces passed
        (reference Viewer markers — SURVEY.md §2.3)."""
        import json

        from jiminy_tpu.engine.engine import Engine, EngineOptions
        from jiminy_tpu.viewer import extract_skeleton_frames, replay_html
        from tests.test_constraints import make_free_box

        tree = make_free_box()
        eng = Engine(
            tree, EngineOptions(dt=2e-3, contact_model="constraint")
        )
        st = eng.reset(q=tree.neutral_q().at[2].set(0.12))
        qs, fs = [], []
        step = jax.jit(lambda s: eng.step(s, jnp.zeros(tree.nv)))
        for _ in range(30):
            st = step(s=st)
            qs.append(np.asarray(st.q))
            fs.append(np.asarray(st.contact_forces))
        qs, fs = np.stack(qs), np.stack(fs)
        data = extract_skeleton_frames(tree, qs, forces=fs)
        assert len(data["com"]) == len(data["frames"])
        # box com ≈ body origin
        np.testing.assert_allclose(
            data["com"][0], qs[0][:3], atol=1e-3
        )
        assert np.shape(data["force_tips"]) == (30, tree.ncp, 3)
        p = tmp_path / "markers.html"
        replay_html(tree, qs, p, forces=fs)
        html = p.read_text()
        assert '"com"' in html and '"force_tips"' in html

    def test_replay_from_log(self, tmp_path):
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_pendulum
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator
        from jiminy_tpu.viewer import replay_from_log

        sim = Simulator(
            Robot(make_pendulum()), ground=FlatGround(height=jnp.float32(-10))
        )
        _, log = sim.simulate(0.3, q0=jnp.array([0.8]))
        p = tmp_path / "replay.html"
        replay_from_log(sim.tree, log, p)
        assert p.stat().st_size > 2000


class TestPcgJax:
    def test_matches_reference_stream(self):
        from jiminy_tpu.utils.pcg_jax import pcg32_init, pcg32_next

        st = pcg32_init(42, 54)

        @jax.jit
        def draw6(st):
            outs = []
            for _ in range(6):
                st, u = pcg32_next(st)
                outs.append(u)
            return st, jnp.stack(outs)

        _, o = draw6(st)
        assert [int(x) for x in o] == [
            0xA15C02B7, 0x7B47F409, 0xBA1D3330,
            0x83D2F293, 0xBFA4784B, 0xCBED606E,
        ]

    def test_matches_host_pcg32(self):
        from jiminy_tpu.utils.pcg_jax import pcg32_init, pcg32_next
        from jiminy_tpu.utils.random import PCG32

        host = PCG32(7, 3)
        st = pcg32_init(7, 3)
        for _ in range(20):
            st, u = pcg32_next(st)
            assert int(u) == host.uint32()

    def test_uniform_range(self):
        from jiminy_tpu.utils.pcg_jax import pcg32_init, pcg32_uniform

        st = pcg32_init(0)
        vals = []
        for _ in range(100):
            st, x = pcg32_uniform(st, -1.0, 1.0)
            vals.append(float(x))
        vals = np.array(vals)
        assert vals.min() >= -1.0 and vals.max() <= 1.0
        assert abs(vals.mean()) < 0.2

    def test_record_gif(self, tmp_path):
        """Animated GIF export (reference: video recording)."""
        from jiminy_tpu.models.toys import make_double_pendulum
        from jiminy_tpu.viewer import record_gif

        tree = make_double_pendulum()
        ts = np.linspace(0, 2 * np.pi, 40)
        qs = np.stack([np.sin(ts), np.cos(ts)], axis=1)
        p = tmp_path / "swing.gif"
        record_gif(tree, qs, p, fps=20)
        raw = p.read_bytes()
        assert raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) > 2000
