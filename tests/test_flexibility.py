"""Flexible-joint tests — rigid equivalence at high stiffness, analytic
static sag, topology remapping (reference pattern: SURVEY.md §4
"flexible-model equivalence (rigid model + near-infinite stiffness ≈
rigid)")."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import (
    JointType,
    TreeBuilder,
    map_configuration,
    map_velocity,
)
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.models.toys import make_double_pendulum


def _ground():
    return FlatGround(height=jnp.float32(-100.0))


class TestSpringJoint:
    def test_static_sag_matches_analytic(self):
        """Body on a spherical spring joint under tilted gravity: small-angle
        equilibrium log(quat)_y ≈ m·g_x·L/k."""
        m, L, k, gx = 1.0, 0.5, 200.0, 2.0
        b = TreeBuilder(gravity=(gx, 0.0, -9.81))
        b.add_body(
            "beam",
            parent=-1,
            joint_type=JointType.SPHERICAL,
            mass=m,
            com=(0, 0, -L),
            inertia=np.diag([1e-3] * 3),
            stiffness=k,
            damping=2.0,
        )
        tree = b.build()
        eng = Engine(tree, EngineOptions(dt=1e-3), ground=_ground())
        st = eng.reset()
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(3), n_substeps=4000))(st)
        from jiminy_tpu.math import so3

        rot = so3.quat_log(st.q[:4])
        # gravity +x tips the hanging mass toward +x ⇒ negative pitch
        theta_expect = -m * gx * L / k  # small-angle
        assert abs(float(rot[1]) - theta_expect) / abs(theta_expect) < 0.05
        assert float(jnp.max(jnp.abs(st.v))) < 1e-3  # settled


class TestInsertFlexibility:
    def _flex_tree(self, stiffness):
        b = TreeBuilder()
        j1 = b.add_body(
            "l1", -1, JointType.REVOLUTE, axis=(0, 1, 0), mass=1.0,
            com=(0, 0, -1), joint_name="shoulder",
        )
        b.add_body(
            "l2", j1, JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0, 0, -1)),
            axis=(0, 1, 0), mass=1.0, com=(0, 0, -1), joint_name="elbow",
        )
        b.add_frame("tip", 1, TreeBuilder.make_placement(pos=(0, 0, -1)))
        b.add_contact_point("tip_c", 1, (0, 0, -1))
        # flex inertia must be large enough for the twist mode (where the
        # point-mass link contributes nothing) to stay stable at dt
        b.insert_flexibility(
            "elbow", stiffness=stiffness, damping=0.05 * np.sqrt(stiffness),
            inertia=1e-2,
        )
        return b.build()

    def test_topology_after_insertion(self):
        tree = self._flex_tree(10000.0)
        assert tree.nb == 3
        assert tree.body_name == ("l1", "l2_flex", "l2")
        assert tree.parent == (-1, 0, 1)
        assert tree.joint_type[1] == JointType.SPHERICAL
        assert tree.nq == 1 + 4 + 1 and tree.nv == 1 + 3 + 1
        # frame & contact still attached to l2 (remapped index)
        assert tree.frame_body == (2,)
        assert tree.contact_body == (2,)
        assert float(tree.stiffness[1]) == 10000.0

    def test_high_stiffness_matches_rigid(self):
        rigid = make_double_pendulum()
        flex = self._flex_tree(2e4)
        q0_r = jnp.array([0.8, 0.3])
        v0_r = jnp.zeros(2)
        q0_f = map_configuration(rigid, flex, q0_r)
        v0_f = map_velocity(rigid, flex, v0_r)
        opts = EngineOptions(dt=1e-4, enable_bounds=False)
        eng_r = Engine(rigid, opts, ground=_ground())
        eng_f = Engine(flex, opts, ground=_ground())
        st_r = eng_r.reset(q=q0_r, v=v0_r)
        st_f = eng_f.reset(q=q0_f, v=v0_f)
        st_r = jax.jit(
            lambda s: eng_r.step(s, jnp.zeros(2), n_substeps=5000)
        )(st_r)
        st_f = jax.jit(
            lambda s: eng_f.step(s, jnp.zeros(5), n_substeps=5000)
        )(st_f)
        # compare the two real joints after 0.5 s of swinging
        q_back = map_configuration(flex, rigid, st_f.q)
        np.testing.assert_allclose(
            np.asarray(q_back), np.asarray(st_r.q), atol=0.02
        )

    def test_roundtrip_state_mapping(self):
        rigid = make_double_pendulum()
        flex = self._flex_tree(1e4)
        q = jnp.array([0.5, -0.7])
        v = jnp.array([1.0, 2.0])
        q2 = map_configuration(flex, rigid, map_configuration(rigid, flex, q))
        v2 = map_velocity(flex, rigid, map_velocity(rigid, flex, v))
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v))


class TestRobotFlexibility:
    def test_anymal_with_flexible_knees_runs(self):
        from jiminy_tpu.models.quadruped import anymal_hardware, anymal_urdf
        from jiminy_tpu.robot import build_robot

        hw = anymal_hardware()
        hw["Flexibility"] = {
            f"{leg}_KFE": {
                "joint_name": f"{leg}_KFE",
                "stiffness": 5000.0,
                "damping": 5.0,
                "inertia": 1e-3,
            }
            for leg in ("LF", "RF", "LH", "RH")
        }
        robot = build_robot(anymal_urdf(), hardware=hw, freeflyer=True)
        tree = robot.tree
        assert tree.nb == 17  # 13 + 4 flex bodies
        assert tree.nv == 18 + 12
        eng = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint"),
            motors=robot.motors,
        )
        q0 = tree.neutral_q().at[2].set(0.6)
        st = eng.reset(q=q0)
        st = jax.jit(
            lambda s: eng.step(s, jnp.zeros(12), n_substeps=100)
        )(st)
        assert bool(jnp.all(jnp.isfinite(st.q)))
