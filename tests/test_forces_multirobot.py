"""External force registry + multi-robot forest tests (reference: Engine
external forces & multi-robot coupling — SURVEY.md §2.1, §4
"multi-robot coupling forces")."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import merge_trees
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.engine.forces import CouplingForce, ImpulseForce, ProfileForce
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.models.toys import make_free_box, make_pendulum


def _low_ground():
    return FlatGround(height=jnp.float32(-100.0))


def _box_with_frame():
    from jiminy_tpu.core.tree import JointType, TreeBuilder

    b = TreeBuilder(gravity=(0, 0, 0))  # zero-g for clean momentum checks
    box = b.add_body(
        "box", -1, JointType.FREE, mass=2.0,
        inertia=np.diag([0.02] * 3), joint_name="root",
    )
    b.add_frame("center", box)
    return b.build()


class TestImpulseForce:
    def test_momentum_transfer(self):
        tree = _box_with_frame()
        imp = ImpulseForce(
            frame=0,
            t_start=jnp.float32(0.05),
            duration=jnp.float32(0.1),
            force=jnp.array([4.0, 0.0, 0.0]),
        )
        eng = Engine(
            tree, EngineOptions(dt=1e-3), ground=_low_ground(), forces=(imp,)
        )
        st = eng.reset()
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(6), n_substeps=300))(st)
        # Δv = F·Δt/m = 4·0.1/2 = 0.2
        assert abs(float(st.v[0]) - 0.2) < 5e-3
        assert abs(float(st.v[1])) < 1e-6

    def test_window_only(self):
        tree = _box_with_frame()
        imp = ImpulseForce(
            frame=0, t_start=jnp.float32(1.0), duration=jnp.float32(0.1),
            force=jnp.array([4.0, 0.0, 0.0]),
        )
        eng = Engine(
            tree, EngineOptions(dt=1e-3), ground=_low_ground(), forces=(imp,)
        )
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(6), n_substeps=100))(
            eng.reset()
        )
        assert abs(float(st.v[0])) < 1e-8  # before the window


class TestProfileForce:
    def test_gravity_compensation_profile(self):
        from jiminy_tpu.core.tree import JointType, TreeBuilder

        b = TreeBuilder()
        box = b.add_body(
            "box", -1, JointType.FREE, mass=1.5,
            inertia=np.diag([0.01] * 3), joint_name="root",
        )
        b.add_frame("center", box)
        tree = b.build()
        prof = ProfileForce(
            frame=0, fn=lambda t: jnp.array([0.0, 0.0, 1.5 * 9.81])
        )
        eng = Engine(
            tree, EngineOptions(dt=1e-3), ground=_low_ground(), forces=(prof,)
        )
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(6), n_substeps=500))(
            eng.reset(q=tree.neutral_q().at[2].set(1.0))
        )
        assert abs(float(st.q[2]) - 1.0) < 1e-4  # hovers

    def test_time_dependent_profile(self):
        from jiminy_tpu.core.tree import JointType, TreeBuilder

        b = TreeBuilder(gravity=(0, 0, 0))
        b.add_body("box", -1, JointType.FREE, mass=1.0,
                   inertia=np.diag([0.01] * 3), joint_name="root")
        b.add_frame("center", 0)
        tree = b.build()
        # f(t) = [cos(2πt), 0, 0]: over one period net impulse ≈ 0
        prof = ProfileForce(
            frame=0,
            fn=lambda t: jnp.array([jnp.cos(2 * jnp.pi * t), 0.0, 0.0]),
        )
        eng = Engine(
            tree, EngineOptions(dt=1e-3), ground=_low_ground(), forces=(prof,)
        )
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(6), n_substeps=1000))(
            eng.reset()
        )
        assert abs(float(st.v[0])) < 5e-3


class TestMergeTrees:
    def test_merged_matches_individual(self):
        p = make_pendulum()
        merged = merge_trees([p, p], prefixes=["a/", "b/"])
        assert merged.nb == 2 and merged.nq == 2 and merged.nv == 2
        assert merged.parent == (-1, -1)
        assert merged.joint_name == ("a/pivot", "b/pivot")
        q = jnp.array([0.7, -0.4])
        v = jnp.array([0.2, 1.0])
        tau = jnp.array([0.1, -0.3])
        a_merged = algos.aba(merged, q, v, tau)
        a0 = algos.aba(p, q[:1], v[:1], tau[:1])
        a1 = algos.aba(p, q[1:], v[1:], tau[1:])
        np.testing.assert_allclose(
            np.asarray(a_merged), np.asarray(jnp.concatenate([a0, a1])),
            rtol=1e-5,
        )

    def test_merged_frames_and_contacts_remap(self):
        p = make_pendulum()
        merged = merge_trees([p, p])
        assert merged.frame_body == (0, 1)
        assert merged.contact_body == (0, 1)
        assert merged.frame_name[1] == "robot1/tip"


class TestCouplingForce:
    def test_spring_pulls_boxes_momentum_conserved(self):
        from jiminy_tpu.core.tree import JointType, TreeBuilder

        def box_tree():
            b = TreeBuilder(gravity=(0, 0, 0))
            b.add_body("box", -1, JointType.FREE, mass=1.0,
                       inertia=np.diag([0.01] * 3), joint_name="root")
            b.add_frame("c", 0)
            return b.build()

        merged = merge_trees([box_tree(), box_tree()])
        coup = CouplingForce.create(
            frame1=0, frame2=1, k_lin=20.0, c_lin=4.0
        )
        eng = Engine(
            merged, EngineOptions(dt=1e-3), ground=_low_ground(),
            forces=(coup,),
        )
        q0 = merged.neutral_q().at[7].set(1.0)  # box2 at x=1
        st = jax.jit(lambda s: eng.step(s, jnp.zeros(12), n_substeps=3000))(
            eng.reset(q=q0)
        )
        # boxes pulled together (critically-damped-ish spring settles)
        d = float(st.q[7] - st.q[0])
        assert d < 0.25
        # symmetric: total momentum stays zero
        assert abs(float(st.v[0] + st.v[6])) < 1e-4
        # they approach the common center 0.5
        assert abs(float(st.q[0]) - 0.5) < 0.3
