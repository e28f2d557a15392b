"""Body-body / self-collision primitive pairs (engine/collision.py).

Reference: jiminy's hpp-fcl collision pairs — body-body, self-collision
and robot-robot contact (SURVEY.md §2.1 "Model" collision geometry &
pairs, §2.1 "Engine" collision detect). VERDICT r3 missing #2
done-criteria: analytic two-sphere impact, a link-crossing test that
self-collision prevents, merged-forest robot-robot contact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core.tree import JointType, TreeBuilder, merge_trees


def _xlate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (x, y, z)
    return m
from jiminy_tpu.engine import (
    CollisionPair,
    Engine,
    EngineOptions,
    Sphere,
)
from jiminy_tpu.engine.collision import (
    Capsule,
    closest_segment_segment,
)


def _free_sphere_tree(name="ball", mass=1.0, r=0.1):
    b = TreeBuilder(gravity=(0.0, 0.0, 0.0))
    i = 0.4 * mass * r * r
    b.add_body(
        name, parent=-1, joint_type=JointType.FREE, mass=mass,
        com=(0, 0, 0), inertia=np.diag([i, i, i]).astype(np.float32),
        joint_name=f"{name}_root",
    )
    return b.build()


def _two_ball_tree():
    """One tree with TWO free bodies (a merged forest)."""
    t1 = _free_sphere_tree("ball_a")
    t2 = _free_sphere_tree("ball_b")
    return merge_trees([t1, t2])


class TestNarrowPhase:
    def test_segment_segment_closed_form(self):
        # parallel unit segments 1 apart → closest distance 1
        ca, cb = closest_segment_segment(
            jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 1.0, 0.0]),
        )
        assert abs(float(jnp.linalg.norm(ca - cb)) - 1.0) < 1e-6
        # crossing perpendicular segments → closest at the crossing
        ca, cb = closest_segment_segment(
            jnp.array([-1.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, -1.0, 0.5]), jnp.array([0.0, 1.0, 0.5]),
        )
        np.testing.assert_allclose(np.asarray(ca), [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(cb), [0, 0, 0.5], atol=1e-6)
        # degenerate: two points (sphere-sphere)
        p = jnp.array([0.0, 0.0, 0.0])
        q = jnp.array([0.3, 0.4, 0.0])
        ca, cb = closest_segment_segment(p, p, q, q)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(p), atol=1e-7)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(q), atol=1e-7)


class TestTwoSphereImpact:
    """Analytic: equal masses, head-on, inelastic PGS impact → common
    normal velocity (momentum conserved, relative velocity killed)."""

    def test_head_on_impact(self):
        tree = _two_ball_tree()
        r = 0.1
        pairs = (
            CollisionPair(
                Sphere("robot0/ball_a", (0, 0, 0), r),
                Sphere("robot1/ball_b", (0, 0, 0), r),
                friction=0.0,
            ),
        )
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=32,
            ),
            collision_pairs=pairs,
        )
        # ball_a at origin moving +x at 1 m/s; ball_b at x=0.5 at rest
        q = tree.neutral_q()
        q = q.at[7 + 0].set(0.5)  # ball_b x (second free joint q block)
        v = jnp.zeros(tree.nv).at[0].set(1.0)  # ball_a vx
        st = eng.reset(q=q, v=v)
        out = jax.jit(
            lambda s: eng.step(s, jnp.zeros(tree.nv), n_substeps=600)
        )(st)
        va = float(out.v[0])
        vb = float(out.v[6])
        # momentum conserved: m·1.0 = m·va + m·vb
        assert abs((va + vb) - 1.0) < 1e-3, (va, vb)
        # inelastic: common velocity 0.5 each
        assert abs(va - 0.5) < 5e-2 and abs(vb - 0.5) < 5e-2, (va, vb)
        # no interpenetration beyond slop
        gap = (float(out.q[7]) - float(out.q[0])) - 2 * r
        assert gap > -5e-3, gap

    def test_balls_pass_through_without_pair(self):
        """Control: the SAME setup with no declared pair passes through
        (collision is the feature under test, not a side effect)."""
        tree = _two_ball_tree()
        eng = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint"),
        )
        q = tree.neutral_q().at[7].set(0.5)
        v = jnp.zeros(tree.nv).at[0].set(1.0)
        st = eng.reset(q=q, v=v)
        out = jax.jit(
            lambda s: eng.step(s, jnp.zeros(tree.nv), n_substeps=600)
        )(st)
        assert float(out.v[0]) == pytest.approx(1.0, abs=1e-5)
        assert float(out.q[0]) > 0.55  # sailed past ball_b


class TestSelfCollision:
    """A 2-link pendulum with capsule links: without self-collision the
    distal link swings THROUGH the proximal one; with the declared pair
    it stops at contact."""

    @staticmethod
    def _arm():
        b = TreeBuilder(gravity=(0.0, 0.0, 0.0))
        # link1 is near-immovable (1000× inertia) so the elbow swing is
        # monotone — a light link1 exchanges momentum and un-folds
        l1 = b.add_body(
            "link1", parent=-1, joint_type=JointType.REVOLUTE,
            axis=(0, 1, 0), mass=1000.0, com=(0.25, 0, 0),
            inertia=np.diag([10.0, 100.0, 100.0]).astype(np.float32),
            joint_name="j1",
        )
        l2 = b.add_body(
            "link2", parent=l1, joint_type=JointType.REVOLUTE,
            axis=(0, 1, 0), mass=1.0, com=(0.25, 0, 0),
            inertia=np.diag([1e-3, 0.02, 0.02]).astype(np.float32),
            joint_name="j2", placement=_xlate(0.5, 0, 0),
        )
        return b.build(), l1, l2

    def _swing(self, with_pair):
        tree, l1, l2 = self._arm()
        pairs = ()
        if with_pair:
            pairs = (
                CollisionPair(
                    Capsule("link1", (0.05, 0, 0), (0.45, 0, 0), 0.05),
                    Capsule("link2", (0.05, 0, 0), (0.45, 0, 0), 0.05),
                    friction=0.0,
                ),
            )
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=16,
            ),
            collision_pairs=pairs,
        )
        # fold the elbow: link2 swings toward link1 at 4 rad/s
        st = eng.reset(
            q=jnp.zeros(tree.nq), v=jnp.array([0.0, 4.0])
        )
        out = jax.jit(
            lambda s: eng.step(s, jnp.zeros(tree.nv), n_substeps=1200)
        )(st)
        return float(out.q[1])

    def test_pair_blocks_crossing(self):
        elbow_free = self._swing(with_pair=False)
        elbow_blocked = self._swing(with_pair=True)
        # free: folds past π (crosses through the first link)
        assert elbow_free > 3.0, elbow_free
        # blocked: capsule-capsule contact stops it short of folding flat
        assert elbow_blocked < 3.0, elbow_blocked
        assert jnp.isfinite(elbow_blocked)


class TestPairKernel:
    """Collision pairs resolved IN the whole-substep Pallas kernel
    (VERDICT r4 next #2): the lane-major narrow phase + [t1,t2,n] pair
    blocks must match the XLA path's pair_rows assembly."""

    def test_two_sphere_kernel_matches_xla(self):
        tree = _two_ball_tree()
        r = 0.1
        pairs = (
            CollisionPair(
                Sphere("robot0/ball_a", (0, 0, 0), r),
                Sphere("robot1/ball_b", (0, 0, 0), r),
                friction=0.4,
            ),
        )
        outs = {}
        for backend in ("xla", "pallas_substep"):
            eng = Engine(
                tree,
                EngineOptions(
                    dt=1e-3, contact_model="constraint", pgs_iters=16,
                    constraint_solver=backend,
                    compute_solver_residual=True,
                ),
                collision_pairs=pairs,
            )
            # already touching with closing + tangential velocity so
            # friction rows do real work
            q = tree.neutral_q().at[7].set(2 * r - 1e-3)
            v = (
                jnp.zeros(tree.nv)
                .at[0].set(1.0)   # closing
                .at[1].set(0.3)   # tangential
            )
            B = 4
            qb = jnp.tile(q, (B, 1))
            vb = jnp.tile(v, (B, 1)) * jnp.linspace(
                0.5, 1.5, B
            )[:, None]
            states = jax.vmap(lambda qq, vv: eng.reset(q=qq, v=vv))(
                qb, vb
            )
            step = jax.jit(
                jax.vmap(
                    lambda s: eng.step(
                        s, jnp.zeros(tree.nv), n_substeps=5
                    )
                )
            )
            outs[backend] = step(states)
            if backend == "pallas_substep":
                assert eng._substep_spec.pair_gens  # actually in-kernel
        a, b = outs["xla"], outs["pallas_substep"]
        np.testing.assert_allclose(b.q, a.q, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(b.v, a.v, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(b.lam, a.lam, atol=1e-4, rtol=1e-2)
        # the pair actually acted: momentum transferred to ball_b (the
        # final-substep λ may already be 0 once the impact has resolved)
        assert np.all(np.asarray(a.v[:, 6]) > 0.05)

    def test_capsule_pair_kernel_matches_xla(self):
        """Capsule-capsule (the Cassie self-collision shape) through the
        kernel narrow phase, revolute-joint arm."""
        tree, l1, l2 = TestSelfCollision._arm()
        pairs = (
            CollisionPair(
                Capsule("link1", (0.05, 0, 0), (0.45, 0, 0), 0.05),
                Capsule("link2", (0.05, 0, 0), (0.45, 0, 0), 0.05),
                friction=0.2,
            ),
        )
        outs = {}
        for backend in ("xla", "pallas_substep"):
            eng = Engine(
                tree,
                EngineOptions(
                    dt=1e-3, contact_model="constraint", pgs_iters=16,
                    constraint_solver=backend,
                    compute_solver_residual=True,
                ),
                collision_pairs=pairs,
            )
            # elbow folded near contact, still swinging
            B = 3
            q0 = jnp.array([0.0, 2.8])
            qb = jnp.tile(q0, (B, 1)).at[:, 1].add(
                jnp.array([0.0, 0.05, 0.1])
            )
            states = jax.vmap(lambda qq: eng.reset(q=qq))(qb)
            states = states.replace(
                v=jnp.tile(jnp.array([0.0, 2.0]), (B, 1))
            )
            step = jax.jit(
                jax.vmap(
                    lambda s: eng.step(
                        s, jnp.zeros(tree.nv), n_substeps=5
                    )
                )
            )
            outs[backend] = step(states)
        a, b = outs["xla"], outs["pallas_substep"]
        np.testing.assert_allclose(b.q, a.q, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(b.v, a.v, atol=1e-3, rtol=1e-3)
        assert float(jnp.max(jnp.abs(a.lam))) > 1e-4


class TestRobotRobot:
    def test_merged_forest_contact_under_vmap(self):
        """Two merged robots collide; vmapped batch stays finite and the
        contact impulse separates them in every env."""
        tree = _two_ball_tree()
        pairs = (
            CollisionPair(
                Sphere("robot0/ball_a", (0, 0, 0), 0.1),
                Sphere("robot1/ball_b", (0, 0, 0), 0.1),
            ),
        )
        eng = Engine(
            tree,
            EngineOptions(dt=1e-3, contact_model="constraint"),
            collision_pairs=pairs,
        )
        B = 4
        speeds = jnp.array([0.5, 1.0, 1.5, 2.0])
        q0 = jnp.tile(tree.neutral_q().at[7].set(0.4), (B, 1))
        states = jax.vmap(lambda q: eng.reset(q=q))(q0)
        states = states.replace(
            v=jax.vmap(lambda s: jnp.zeros(tree.nv).at[0].set(s))(speeds)
        )
        out = jax.jit(
            jax.vmap(
                lambda s: eng.step(s, jnp.zeros(tree.nv), n_substeps=500)
            )
        )(states)
        va, vb = np.asarray(out.v[:, 0]), np.asarray(out.v[:, 6])
        np.testing.assert_allclose(va + vb, np.asarray(speeds), atol=5e-3)
        assert np.all(np.isfinite(np.asarray(out.q)))
        # faster approach → faster post-impact common velocity
        assert np.all(np.diff(vb) > 0)
