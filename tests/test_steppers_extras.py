"""Adaptive DOPRI stepper, backlash joints, options API, Trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, TreeBuilder
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.models.toys import make_pendulum


def _ground():
    return FlatGround(height=jnp.float32(-100.0))


class TestAdaptiveStepper:
    def test_energy_conservation_tight(self):
        """Adaptive DOPRI conserves pendulum energy to the tolerance — the
        reference's default-stepper quality bar (SURVEY.md §4: energy
        conservation at tight tolerance)."""
        tree = make_pendulum()
        eng = Engine(tree, EngineOptions(dt=1e-3), ground=_ground())
        st = eng.reset(q=jnp.array([1.2]))
        e0 = sum(map(float, algos.energy(tree, st.q, st.v)))
        # f32-realistic tolerances (the reference runs f64; parity mode
        # would enable jax x64)
        run = jax.jit(
            lambda s: eng.simulate_adaptive(s, 5.0, tol_rel=1e-6, tol_abs=1e-8)
        )
        st2, stats = run(st)
        jax.block_until_ready(st2)
        e1 = sum(map(float, algos.energy(tree, st2.q, st2.v)))
        assert abs(float(st2.t) - 5.0) < 1e-4
        assert abs(e1 - e0) < 5e-3
        assert int(stats["accepted"]) > 50
        # matches a fine fixed-step RK4 reference trajectory
        eng4 = Engine(
            tree,
            EngineOptions(dt=1e-4, solver="runge_kutta_4"),
            ground=_ground(),
        )
        st4 = jax.jit(
            lambda s: eng4.step(s, jnp.zeros(1), n_substeps=50000)
        )(eng4.reset(q=jnp.array([1.2])))
        assert abs(float(st4.q[0]) - float(st2.q[0])) < 5e-3

    def test_adaptive_takes_fewer_steps_than_fixed(self):
        tree = make_pendulum()
        eng = Engine(tree, EngineOptions(dt=1e-4), ground=_ground())
        st = eng.reset(q=jnp.array([0.5]))
        _, stats = jax.jit(lambda s: eng.simulate_adaptive(s, 1.0))(st)
        assert int(stats["iters"]) < 2000  # ≪ 10000 fixed 1e-4 steps

    def test_rejects_on_impulse_path(self):
        from jiminy_tpu.models.toys import make_free_box

        eng = Engine(
            make_free_box(), EngineOptions(contact_model="constraint")
        )
        with pytest.raises(ValueError):
            eng.simulate_adaptive(eng.reset(), 1.0)


class TestBacklash:
    def _tree(self, play):
        b = TreeBuilder()
        b.add_body(
            "link", -1, JointType.REVOLUTE, axis=(0, 1, 0), mass=1.0,
            com=(0, 0, -1.0), joint_name="pivot", armature=0.02,
        )
        b.insert_backlash("pivot", play=play, armature=1e-3)
        return b.build()

    def test_topology(self):
        tree = self._tree(0.1)
        assert tree.nb == 2
        assert tree.body_name == ("link_backlash", "link")
        assert tree.joint_type == (JointType.REVOLUTE, JointType.REVOLUTE)
        assert float(tree.q_min[0]) == pytest.approx(-0.05)
        assert float(tree.q_max[0]) == pytest.approx(0.05)

    def test_play_is_free_then_limited(self):
        """The backlash DoF swings freely within the play and is stopped by
        the bound constraint at its edges."""
        tree = self._tree(0.2)
        eng = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint"),
            ground=_ground(),
        )
        # lock the driven joint with a PD at 0.5; gravity pulls the link
        # through the backlash to its -play/2 edge
        def ctrl(q, v, t):
            return jnp.array([0.0, 200.0 * (0.5 - q[1]) - 5.0 * v[1]])

        eng.internal_dynamics = lambda q, v, t: ctrl(q, v, t)
        st = eng.reset(q=jnp.array([0.0, 0.5]))
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(2), n_substeps=2000))(st)
        assert abs(float(st.q[0]) + 0.1) < 5e-3  # resting at the play edge
        assert abs(float(st.q[1]) - 0.5) < 0.05


class TestOptionsApi:
    def test_get_set_roundtrip(self):
        tree = make_pendulum()
        eng = Engine(tree, EngineOptions(dt=1e-3), ground=_ground())
        opts = eng.get_options()
        assert opts["dt"] == 1e-3
        eng.set_options({"dt": 2e-3, "contacts": {"friction": 0.7}})
        assert eng.options.dt == 2e-3
        assert float(eng.options.contacts.friction) == pytest.approx(0.7)
        # solver switch rebuilds the stepper
        eng.set_options({"solver": "runge_kutta_4"})
        st = eng.reset(q=jnp.array([0.3]))
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(1), n_substeps=10))(st)
        assert bool(jnp.isfinite(st.q[0]))


class TestTrajectory:
    def test_interpolation_and_log_extraction(self):
        from jiminy_tpu.dynamics import Trajectory
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator

        sim = Simulator(Robot(make_pendulum()), ground=_ground())
        _, log = sim.simulate(0.5, q0=jnp.array([1.0]))
        traj = Trajectory.from_log(sim.tree, log)
        assert len(traj) == 500
        q_mid, v_mid = traj.at(0.25)
        # midpoint between adjacent samples
        i = np.searchsorted(traj.times, 0.25) - 1
        assert (
            min(traj.qs[i, 0], traj.qs[i + 1, 0]) - 1e-6
            <= float(q_mid[0])
            <= max(traj.qs[i, 0], traj.qs[i + 1, 0]) + 1e-6
        )
        # endpoints clamp
        q0, _ = traj.at(-1.0)
        assert float(q0[0]) == pytest.approx(float(traj.qs[0, 0]))

    def test_quaternion_interpolation_normalized(self):
        from jiminy_tpu.dynamics import Trajectory
        from jiminy_tpu.models.toys import make_free_box
        from jiminy_tpu.math import so3

        tree = make_free_box()
        q0 = tree.neutral_q()
        quat1 = so3.rpy_to_quat(jnp.array([0.0, 0.0, 1.0]))
        q1 = q0.at[3:7].set(quat1)
        traj = Trajectory(
            tree, np.array([0.0, 1.0]), np.stack([q0, q1])
        )
        q_half, _ = traj.at(0.5)
        quat = np.asarray(q_half[3:7])
        assert abs(np.linalg.norm(quat) - 1.0) < 1e-6
        rpy = np.asarray(so3.quat_to_rpy(jnp.asarray(quat)))
        assert abs(rpy[2] - 0.5) < 1e-5  # geodesic midpoint
