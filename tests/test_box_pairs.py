"""Exact box/mesh pair narrow phase (VERDICT r4 next #7).

Reference: hpp-fcl gives jiminy exact convex-convex distance
(SURVEY.md §1 L0, §2.1 "Model"). Rounds 1-4 degraded box and mesh pair
shapes to a fitted bounding capsule — wrong for flat/boxy geometry (a
resting box reported contact at the capsule surface, not the face).
Round 5 adds SDF-based point contacts: box pairs use the exact oriented
-box signed distance over the other shape's corner/support/sample
points; mesh pairs test support points against the other shape's SDF.

Pins (the VERDICT done-criteria):
- box resting on box sits at the EXACT face height;
- a mesh pair rests far tighter than its bounding-capsule distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core.tree import JointType, TreeBuilder
from jiminy_tpu.engine import (
    Box,
    CollisionPair,
    Engine,
    EngineOptions,
    Sphere,
)
from jiminy_tpu.engine.collision import box_sdf


def _slab_and_free_body(slab_half=(0.3, 0.3, 0.05), free_mass=1.0):
    """Stiff-sprung prismatic slab (a firm platform, ~0.1 mm gravity
    sag at k=1e7) + a FREE body above it."""
    b = TreeBuilder()
    i_s = 10.0
    slab = b.add_body(
        "slab", parent=-1, joint_type=JointType.PRISMATIC,
        axis=(0, 0, 1), mass=100.0, com=(0, 0, 0.05),
        inertia=np.diag([i_s] * 3).astype(np.float32),
        joint_name="slab_z", stiffness=1e7, damping=1e4,
    )
    i_c = 0.4 * free_mass * 0.1 * 0.1
    cube = b.add_body(
        "cube", parent=-1, joint_type=JointType.FREE, mass=free_mass,
        com=(0, 0, 0), inertia=np.diag([i_c] * 3).astype(np.float32),
        joint_name="cube_root",
    )
    return b.build(), slab, cube


class TestBoxSDF:
    def test_sdf_values_and_normals(self):
        h = (1.0, 2.0, 3.0)
        pts = jnp.array(
            [
                [2.0, 0.0, 0.0],   # 1 outside +x face
                [0.0, 0.0, 4.5],   # 1.5 outside +z face
                [0.5, 0.0, 0.0],   # inside: nearest face +x at 0.5
                [2.0, 3.0, 0.0],   # outside an edge: sqrt(1+1)
                [0.0, -1.5, 0.0],  # inside, nearest face −y at 0.5
            ]
        )
        sdf, n = box_sdf(pts, h)
        np.testing.assert_allclose(
            np.asarray(sdf), [1.0, 1.5, -0.5, np.sqrt(2.0), -0.5],
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(n[2]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(n[3]), np.array([1, 1, 0]) / np.sqrt(2), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(n[4]), [0, -1, 0], atol=1e-6)


class TestBoxBoxRest:
    def test_box_rests_at_exact_face_height(self):
        """A cube dropped on a slab settles with its face ON the slab
        face — center z = slab top (0.1) + cube half (0.1) — not at a
        bounding-capsule distance (which would hold it ~0.18 higher)."""
        tree, slab, cube = _slab_and_free_body()
        pair = CollisionPair(
            Box("slab", (0, 0, 0.05), (0.3, 0.3, 0.05)),
            Box("cube", (0, 0, 0), (0.1, 0.1, 0.1)),
            friction=0.8,
        )
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=16,
            ),
            collision_pairs=(pair,),
        )
        # 16 point contacts (8 corners each way) → 48 pair rows
        assert eng._pair_set.total_contacts == 16
        assert {k for k, _ in eng._pair_set.gens} == {"ptbox"}
        q0 = tree.neutral_q().at[3].set(0.35)  # cube z (q: slab + free)
        st = eng.reset(q=q0)

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), s.q[3]

            return jax.lax.scan(body, st, None, length=900)

        st, _ = run(st)
        # exact face height, and level (no topple: quat ~ identity)
        assert abs(float(st.q[3]) - 0.2) < 5e-3, float(st.q[3])
        assert abs(float(st.q[7])) > 0.99  # quat w (xyzw at q[4:8])
        assert abs(float(st.q[0])) < 2e-3  # slab barely sagged
        assert float(jnp.max(jnp.abs(st.v))) < 0.05  # settled

    def test_offset_box_tips_off_the_edge(self):
        """Control: spawned half-overhanging the slab edge, the cube
        must NOT rest level — the point contacts only exist where the
        geometry overlaps (face contact is not a trivial plane)."""
        tree, slab, cube = _slab_and_free_body()
        pair = CollisionPair(
            Box("slab", (0, 0, 0.05), (0.3, 0.3, 0.05)),
            Box("cube", (0, 0, 0), (0.1, 0.1, 0.1)),
            friction=0.8,
        )
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=16,
            ),
            collision_pairs=(pair,),
        )
        q0 = tree.neutral_q().at[3].set(0.35).at[1].set(0.38)
        st = eng.reset(q=q0)

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), None

            return jax.lax.scan(body, st, None, length=900)[0]

        st = run(st)
        # tipped: base quat rotated well away from identity OR fell past
        # the face-rest height
        tipped = abs(float(st.q[7])) < 0.99
        fell = float(st.q[3]) < 0.17
        assert tipped or fell, (float(st.q[7]), float(st.q[3]))


class TestSphereBoxRest:
    def test_sphere_rests_on_box_face(self):
        tree, slab, cube = _slab_and_free_body()
        pair = CollisionPair(
            Sphere("cube", (0, 0, 0), 0.1),
            Box("slab", (0, 0, 0.05), (0.3, 0.3, 0.05)),
        )
        eng = Engine(
            tree,
            EngineOptions(
                dt=1e-3, contact_model="constraint", pgs_iters=16,
            ),
            collision_pairs=(pair,),
        )
        assert eng._pair_set.total_contacts == 1
        q0 = tree.neutral_q().at[3].set(0.3)
        st = eng.reset(q=q0)

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), None

            return jax.lax.scan(body, st, None, length=700)[0]

        st = run(st)
        # sphere surface on the face: center at 0.1 + 0.1
        assert abs(float(st.q[3]) - 0.2) < 5e-3, float(st.q[3])


class TestBoxPairKernel:
    """Box pairs (exact SDF point contacts) resolved IN the
    whole-substep kernel — same generators lane-major, one color per
    pair's contact patch."""

    def test_box_pair_kernel_matches_xla(self):
        tree, slab, cube = _slab_and_free_body()
        pair = CollisionPair(
            Box("slab", (0, 0, 0.05), (0.3, 0.3, 0.05)),
            Box("cube", (0, 0, 0), (0.1, 0.1, 0.1)),
            friction=0.8,
        )
        outs = {}
        for backend in ("xla", "pallas_substep"):
            eng = Engine(
                tree,
                EngineOptions(
                    dt=1e-3, contact_model="constraint", pgs_iters=8,
                    constraint_solver=backend,
                    compute_solver_residual=True,
                ),
                collision_pairs=(pair,),
            )
            if backend == "pallas_substep":
                # 16 point contacts baked as in-kernel generators
                assert len(eng._substep_spec.pair_gens) == 2
                assert eng._substep_spec.pair_contacts == [16]
            # landing: cube just above the slab face, small offset +
            # lateral speed so friction rows do real work
            q0 = (
                tree.neutral_q()
                .at[1].set(0.05)
                .at[3].set(0.203)
            )
            B = 3
            states = jax.vmap(lambda q: eng.reset(q=q))(
                jnp.tile(q0, (B, 1))
            )
            v0 = jnp.zeros(tree.nv).at[1].set(-0.3).at[2].set(0.2)
            states = states.replace(
                v=jnp.tile(v0, (B, 1))
                * jnp.linspace(0.5, 1.5, B)[:, None]
            )
            step = jax.jit(
                jax.vmap(
                    lambda s: eng.step(
                        s, jnp.zeros(tree.nv), n_substeps=6
                    )
                )
            )
            outs[backend] = step(states)
        a, b = outs["xla"], outs["pallas_substep"]
        np.testing.assert_allclose(b.q, a.q, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(b.v, a.v, atol=1e-3, rtol=1e-3)
        # the pair actually acted: the falling cube decelerated
        assert float(a.v[-1, 1 + 2]) > -1.5 * 0.3 + 0.05


class TestKernelGate:
    def test_oversized_pair_sets_gate_the_kernel_off(self):
        """More than 24 pair contacts (e.g. two box-box patches) exceed
        the in-kernel assembly cap — explicit request fails loudly,
        auto falls back."""
        tree, slab, cube = _slab_and_free_body()
        pairs = tuple(
            CollisionPair(
                Box("slab", (0, 0, z), (0.3, 0.3, 0.05)),
                Box("cube", (0, 0, 0), (0.1, 0.1, 0.1)),
            )
            for z in (0.05, 0.15)
        )
        with pytest.raises(ValueError, match="contact count too large"):
            Engine(
                tree,
                EngineOptions(
                    dt=1e-3, contact_model="constraint",
                    constraint_solver="pallas_substep",
                ),
                collision_pairs=pairs,
            )
