"""Constraint & PGS solver tests — analytical fixtures, per SURVEY.md §4
(reference pattern: fixed-frame weld, wheel rolling, closed loops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, TreeBuilder
from jiminy_tpu.engine.constraints import (
    DistanceConstraint,
    FrameConstraint,
    JointConstraint,
    WheelConstraint,
)
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.models.toys import make_free_box, make_pendulum


def run(engine, state, t_end, u=None):
    u = jnp.zeros(engine.tree.nv) if u is None else u
    n = round(t_end / engine.options.dt)
    step = jax.jit(lambda s: engine.step(s, u, n_substeps=n))
    return step(state)


class TestFrameConstraint:
    def test_weld_holds_box_against_gravity(self):
        c = FrameConstraint(
            frame=0,
            ref_rot=jnp.eye(3),
            ref_pos=jnp.array([0.0, 0.0, 1.0]),
            baumgarte_freq=20.0,
        )
        b = TreeBuilder()
        box = b.add_body(
            "box",
            parent=-1,
            joint_type=JointType.FREE,
            mass=1.0,
            inertia=np.diag([0.01, 0.01, 0.01]),
            joint_name="root",
        )
        b.add_frame("origin", box)
        tree = b.build()
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        q0 = tree.neutral_q().at[2].set(1.0)
        st = engine.reset(q=q0)
        st = run(engine, st, 1.0)
        np.testing.assert_allclose(np.asarray(st.q[:3]), [0, 0, 1.0], atol=2e-3)
        assert float(jnp.max(jnp.abs(st.v))) < 1e-2

    def test_weld_recovers_from_offset(self):
        b = TreeBuilder()
        box = b.add_body(
            "box",
            parent=-1,
            joint_type=JointType.FREE,
            mass=1.0,
            inertia=np.diag([0.01, 0.01, 0.01]),
            joint_name="root",
        )
        b.add_frame("origin", box)
        tree = b.build()
        c = FrameConstraint(
            frame=0,
            ref_rot=jnp.eye(3),
            ref_pos=jnp.array([0.0, 0.0, 1.0]),
            baumgarte_freq=50.0,
        )
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        # start 5 cm below target: Baumgarte must pull it back
        q0 = tree.neutral_q().at[2].set(0.95)
        st = run(engine, engine.reset(q=q0), 1.0)
        np.testing.assert_allclose(np.asarray(st.q[:3]), [0, 0, 1.0], atol=5e-3)


class TestJointConstraint:
    def test_lock_pendulum_off_vertical(self):
        tree = make_pendulum()
        c = JointConstraint(joint=0, ref_q=jnp.float32(0.5), baumgarte_freq=20.0)
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        st = engine.reset(q=jnp.array([0.5]))
        st = run(engine, st, 1.0)
        assert abs(float(st.q[0]) - 0.5) < 1e-3
        assert abs(float(st.v[0])) < 1e-3


class TestDistanceConstraint:
    def test_closed_loop_distance_maintained(self):
        # two pendulums side by side, tips linked by a rigid rod of length 0.5
        b = TreeBuilder()
        j1 = b.add_body(
            "l1", -1, JointType.REVOLUTE, axis=(0, 1, 0), mass=1.0, com=(0, 0, -1)
        )
        j2 = b.add_body(
            "l2",
            -1,
            JointType.REVOLUTE,
            placement=TreeBuilder.make_placement(pos=(0.5, 0, 0)),
            axis=(0, 1, 0),
            mass=1.0,
            com=(0, 0, -1),
        )
        f1 = b.add_frame("tip1", j1, TreeBuilder.make_placement(pos=(0, 0, -1)))
        f2 = b.add_frame("tip2", j2, TreeBuilder.make_placement(pos=(0, 0, -1)))
        tree = b.build()
        c = DistanceConstraint(
            frame1=f1, frame2=f2, distance=jnp.float32(0.5), baumgarte_freq=20.0
        )
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        st = engine.reset(q=jnp.array([0.3, 0.3]))  # initial distance 0.5 kept
        st = run(engine, st, 1.0)
        xw = algos.forward_kinematics(tree, st.q)
        p1 = xw[0].compose(tree.frame_placement(0)).pos
        p2 = xw[1].compose(tree.frame_placement(1)).pos
        d = float(jnp.linalg.norm(p1 - p2))
        assert abs(d - 0.5) < 2e-3
        # and the loop actually swung (not frozen)
        assert abs(float(st.q[0]) - 0.3) > 0.05


class TestWheelConstraint:
    def _make_wheel(self, radius=0.2):
        b = TreeBuilder()
        w = b.add_body(
            "wheel",
            parent=-1,
            joint_type=JointType.FREE,
            mass=1.0,
            inertia=np.diag([0.01, 0.02, 0.01]),
            joint_name="root",
        )
        b.add_frame("hub", w)
        return b.build()

    def test_rolling_without_slip(self):
        r = 0.2
        tree = self._make_wheel(r)
        c = WheelConstraint(
            frame=0,
            radius=jnp.float32(r),
            axis=jnp.array([0.0, 1.0, 0.0]),
            baumgarte_freq=20.0,
        )
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        q0 = tree.neutral_q().at[2].set(r)  # resting on the ground
        # forward velocity + matched spin: rolling ⇒ v = ω·r
        # (FREE-joint velocities are body-local; at identity they are world)
        w_y = 5.0
        v0 = jnp.zeros(6).at[0].set(w_y * r).at[4].set(w_y)
        st = run(engine, engine.reset(q=q0, v=v0), 0.5)
        # still rolling without slip after 0.5 s: world contact-point vel ≈ 0
        from jiminy_tpu.math import so3

        R = so3.quat_to_matrix(st.q[3:7])
        v_w = R @ st.v[:3]
        w_w = R @ st.v[3:6]
        vc = v_w + jnp.cross(w_w, jnp.array([0.0, 0.0, -r]))
        assert float(jnp.linalg.norm(vc)) < 1e-2
        # still moving forward at ~the initial speed (no energy lost to slip)
        assert abs(float(v_w[0]) - w_y * r) < 5e-2
        # height maintained at the radius
        assert abs(float(st.q[2]) - r) < 2e-3
        # advanced roughly v·t
        assert abs(float(st.q[0]) - w_y * r * 0.5) < 0.05

    def test_slip_is_removed(self):
        r = 0.2
        tree = self._make_wheel(r)
        c = WheelConstraint(frame=0, radius=jnp.float32(r), axis=jnp.array([0.0, 1.0, 0.0]))
        engine = Engine(tree, EngineOptions(dt=1e-3), constraints=(c,))
        q0 = tree.neutral_q().at[2].set(r)
        v0 = jnp.zeros(6).at[0].set(1.0)  # sliding, no spin
        st = run(engine, engine.reset(q=q0, v=v0), 0.5)
        from jiminy_tpu.math import so3

        R = so3.quat_to_matrix(st.q[3:7])
        v_w = R @ st.v[:3]
        w_w = R @ st.v[3:6]
        vc = v_w + jnp.cross(w_w, jnp.array([0.0, 0.0, -r]))
        assert float(jnp.linalg.norm(vc)) < 1e-2  # slide converted → roll


class TestConstraintContacts:
    def test_box_settles_on_ground(self):
        tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
        engine = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint", pgs_iters=24),
        )
        q0 = tree.neutral_q().at[2].set(0.15)  # drop from 5 cm above rest
        st = run(engine, engine.reset(q=q0), 1.0)
        # resting: bottom corners at z≈0 ⇒ com at z≈0.1, small velocity
        assert abs(float(st.q[2]) - 0.1) < 5e-3
        assert float(jnp.max(jnp.abs(st.v))) < 5e-2
        # total normal force ≈ weight
        fz = float(jnp.sum(st.contact_forces[:, 2]))
        assert abs(fz - 9.81) < 0.5

    def test_contact_margin_velocity_barrier(self):
        """Continuous contact activation: a box whose corners hover just
        above the ground (inside contact_margin) and descend fast is
        stopped AT the surface within the substep — no penetration spike
        and no knife-edge active-set flip (the backend-divergence source
        fixed in round 3: depth>0 activation flipped on f32 noise)."""
        tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
        dt = 5e-3
        engine = Engine(
            tree,
            EngineOptions(
                dt=dt, contact_model="constraint", pgs_iters=16,
                contact_margin=5e-3,
            ),
        )
        # corners 2 mm above ground, descending 1 m/s (5 mm per substep)
        q0 = tree.neutral_q().at[2].set(0.102)
        v0 = jnp.zeros(tree.nv).at[2].set(-1.0)
        st = engine.step(engine.reset(q=q0, v=v0), jnp.zeros(tree.nv))
        # barrier: corner may reach the surface but not cross it
        assert float(st.q[2]) > 0.1 - 1e-4, float(st.q[2])
        # and it actually moved down to (numerically at) the surface
        assert float(st.q[2]) < 0.1005, float(st.q[2])
        # outside the margin nothing activates: same drop from higher up
        q1 = tree.neutral_q().at[2].set(0.12)
        st1 = engine.step(engine.reset(q=q1, v=v0), jnp.zeros(tree.nv))
        assert float(jnp.max(st1.contact_forces[:, 2])) == 0.0
        assert float(st1.v[2]) < -1.0  # still in free fall

    def test_friction_cone_holds_static(self):
        tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
        engine = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint", pgs_iters=24),
        )
        q0 = tree.neutral_q().at[2].set(0.0999)  # resting, tiny penetration
        # lateral push below μ·m·g = 9.81 N → static friction holds
        fext = jnp.zeros((tree.nb, 6)).at[0, 3].set(4.0)
        st0 = engine.reset(q=q0)
        n = 500
        u = jnp.zeros(tree.nv)
        step = jax.jit(
            lambda s: engine.step(s, u, n_substeps=n, fext_user=fext)
        )
        st = step(st0)
        assert abs(float(st.q[0])) < 2e-3  # barely moved
        assert abs(float(st.v[0])) < 1e-2

    def test_friction_cone_slides_when_exceeded(self):
        tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
        engine = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint", pgs_iters=24),
        )
        q0 = tree.neutral_q().at[2].set(0.0999)
        fext = jnp.zeros((tree.nb, 6)).at[0, 3].set(20.0)  # > μ·m·g
        st0 = engine.reset(q=q0)
        u = jnp.zeros(tree.nv)
        step = jax.jit(
            lambda s: engine.step(s, u, n_substeps=500, fext_user=fext)
        )
        st = step(st0)
        assert float(st.q[0]) > 0.05  # it slides

    def test_vmap_batch(self):
        tree = make_free_box()
        engine = Engine(
            tree, EngineOptions(dt=1e-3, contact_model="constraint")
        )
        heights = jnp.array([0.15, 0.2, 0.3, 0.12])
        q0 = jnp.tile(tree.neutral_q(), (4, 1)).at[:, 2].set(heights)
        states = jax.vmap(lambda q: engine.reset(q=q))(q0)
        u = jnp.zeros((4, tree.nv))
        step = jax.jit(
            jax.vmap(lambda s, uu: engine.step(s, uu, n_substeps=100))
        )
        out = step(states, u)
        assert out.q.shape == (4, tree.nq)
        assert bool(jnp.all(jnp.isfinite(out.q)))
