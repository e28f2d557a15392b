"""<collision><mesh> support (the last gap in the Model coverage row:
mesh collision geometry, reference-managed through hpp-fcl BVHs —
SURVEY.md §2.1 "Model").

TPU-first reduction (io/urdf.py): at parse time the STL becomes (a) its
convex support points — extreme vertex along 26+14 sphere directions —
attached as static contact sites, and (b) a fitted bounding capsule for
declared body-body pairs (engine.shape_for_link). Pins:

- the support-point extraction recovers exactly a cube's 8 corners;
- a dropped mesh cube RESTS at the analytic height (corner contact);
- the fitted capsule bounds every mesh vertex;
- two mesh links declared as a CollisionPair collide (don't interpenetrate).
"""

import dataclasses
import struct

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.engine import Engine, EngineOptions


def write_cube_stl(path, half=0.1, center=(0.0, 0.0, 0.0)):
    """Minimal binary STL of an axis-aligned cube."""
    c = np.asarray(center, np.float64)
    corners = np.array(
        [[sx, sy, sz] for sx in (-half, half) for sy in (-half, half)
         for sz in (-half, half)]
    ) + c
    # 12 triangles over the 6 faces (same winding layout as
    # viewer3d.box_mesh)
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 7, 5), (4, 6, 7),
        (0, 5, 1), (0, 4, 5), (2, 3, 7), (2, 7, 6),
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
    ]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, cc in faces:
            f.write(struct.pack("<3f", 0.0, 0.0, 0.0))  # normal (unused)
            for idx in (a, b, cc):
                f.write(struct.pack("<3f", *corners[idx]))
            f.write(struct.pack("<H", 0))


def cube_urdf(stl_path, n_links=1):
    links, joints = [], []
    for i in range(n_links):
        links.append(f"""
  <link name="cube{i}">
    <inertial>
      <mass value="1.0"/>
      <inertia ixx="0.007" iyy="0.007" izz="0.007"
               ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><mesh filename="{stl_path}"/></geometry>
    </collision>
  </link>""")
        if i:
            joints.append(f"""
  <joint name="slide{i}" type="prismatic">
    <parent link="cube0"/> <child link="cube{i}"/>
    <origin xyz="0 0 0.5"/> <axis xyz="0 0 1"/>
    <limit effort="100" velocity="10" lower="-2" upper="2"/>
  </joint>""")
    body = "".join(links) + "".join(joints)
    return f'<?xml version="1.0"?>\n<robot name="meshbot">{body}</robot>'


def _build(tmp_path, n_links=1):
    from jiminy_tpu.robot import build_robot

    stl = tmp_path / "cube.stl"
    write_cube_stl(stl)
    hw = {"Global": {"collisionBodyNames": [
        f"cube{i}" for i in range(n_links)
    ]}}
    return build_robot(cube_urdf(stl, n_links), hardware=hw, freeflyer=True)


def _engine(tree, **kw):
    opts = EngineOptions(
        contact_model="constraint", dt=1e-3, pgs_iters=16,
        constraint_solver="xla", **kw,
    )
    opts = dataclasses.replace(
        opts,
        contacts=dataclasses.replace(opts.contacts, friction=jnp.float32(0.8)),
    )
    return Engine(tree, opts)


class TestSupportPoints:
    def test_cube_support_points_are_the_corners(self, tmp_path):
        robot = _build(tmp_path)
        tree = robot.tree
        assert tree.ncp == 8  # exactly the hull vertices
        pts = np.sort(np.round(np.asarray(tree.contact_pos), 6), axis=0)
        expect = np.sort(
            np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                      for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)]),
            axis=0,
        )
        np.testing.assert_allclose(pts, expect, atol=1e-5)
        assert bool(np.all(np.asarray(tree.contact_radius) == 0.0))

    def test_shape_for_link_capsule_bounds_the_mesh(self, tmp_path):
        from jiminy_tpu.engine import shape_for_link

        robot = _build(tmp_path)
        # exact=False pins the fitted-capsule degrade (the round-5
        # default returns the exact ConvexMesh — see TestMeshPair)
        cap = shape_for_link(robot, "cube0", exact=False)
        p0, p1 = np.asarray(cap.p0), np.asarray(cap.p1)
        corners = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                            for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
        seg = p1 - p0
        denom = max(float(seg @ seg), 1e-12)
        s = np.clip((corners - p0) @ seg / denom, 0.0, 1.0)
        d = np.linalg.norm(corners - (p0 + s[:, None] * seg), axis=-1)
        assert float(d.max()) <= cap.radius + 1e-5

    def test_missing_mesh_is_skipped(self, tmp_path):
        from jiminy_tpu.robot import build_robot

        urdf = cube_urdf(tmp_path / "nope.stl")
        try:
            build_robot(
                urdf,
                hardware={"Global": {"collisionBodyNames": ["cube0"]}},
                freeflyer=True,
            )
        except ValueError as e:  # no geometry left → loud opt-in error
            assert "collision body" in str(e)
        else:
            raise AssertionError("expected a loud missing-geometry error")


class TestMeshGroundContact:
    def test_dropped_cube_rests_at_corner_height(self, tmp_path):
        robot = _build(tmp_path)
        tree = robot.tree
        eng = _engine(tree)
        q0 = jnp.asarray(tree.neutral_q().at[2].set(0.25))
        st = eng.reset(q=q0, v=jnp.zeros(tree.nv))

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), s.q[2]

            return jax.lax.scan(body, st, None, length=800)

        st, heights = run(st)
        # rests with the bottom face on the ground: center z = half = 0.1
        assert abs(float(st.q[2]) - 0.1) < 5e-3
        assert abs(float(st.v[5])) < 1e-2  # settled, not bouncing


class TestMeshPairCollision:
    def test_mesh_pair_rests_tighter_than_bounding_capsule(self, tmp_path):
        """Round-5 exact path (VERDICT r4 next #7 done-criterion): the
        default mesh pair (ConvexMesh support points vs the other
        mesh's SDF proxy) must rest FAR tighter than the old
        capsule-capsule degrade. For two 0.1-half cubes the support
        points against the centroid-sphere (r = 0.1√3) rest at center
        gap exactly 0.2 — the true face height — vs 2r ≈ 0.346 for
        capsule-capsule."""
        from jiminy_tpu.engine import CollisionPair, shape_for_link
        from jiminy_tpu.engine.collision import ConvexMesh

        robot = _build(tmp_path, n_links=2)
        tree = robot.tree
        sh0 = shape_for_link(robot, "cube0")
        sh1 = shape_for_link(robot, "cube1")
        assert isinstance(sh0, ConvexMesh)  # exact by default now
        pair = CollisionPair(sh0, sh1)
        opts = EngineOptions(
            contact_model="constraint", dt=1e-3, pgs_iters=16,
            constraint_solver="xla",
        )
        eng = Engine(tree, opts, collision_pairs=[pair])
        # both clouds tested against the other's capsule → 2 generators
        assert len(eng._pair_set.gens) == 2
        # cube1 starts 0.5 m above cube0 on a prismatic rail and falls
        # onto it
        q0 = jnp.asarray(tree.neutral_q().at[2].set(0.1))
        st = eng.reset(q=q0, v=jnp.zeros(tree.nv))

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), s.q[7]

            return jax.lax.scan(body, st, None, length=800)

        st, rail = run(st)
        r = shape_for_link(robot, "cube0", exact=False).radius
        gap = 0.5 + float(st.q[7])
        # tighter than the capsule bound, no interpenetration of faces
        # (near 0.2 = exact face height; the proxy capsule's principal
        # axis is arbitrary for a cube cloud, so allow ~1 cm slack)
        assert gap < 2.0 * r - 0.05, (gap, 2 * r)
        assert 0.19 < gap < 0.23, gap

    def test_capsule_degrade_still_available(self, tmp_path):
        """exact=False keeps the old conservative capsule behavior."""
        from jiminy_tpu.engine import CollisionPair, shape_for_link

        robot = _build(tmp_path, n_links=2)
        tree = robot.tree
        pair = CollisionPair(
            shape_for_link(robot, "cube0", exact=False),
            shape_for_link(robot, "cube1", exact=False),
        )
        opts = EngineOptions(
            contact_model="constraint", dt=1e-3, pgs_iters=16,
            constraint_solver="xla",
        )
        eng = Engine(tree, opts, collision_pairs=[pair])
        q0 = jnp.asarray(tree.neutral_q().at[2].set(0.1))
        st = eng.reset(q=q0, v=jnp.zeros(tree.nv))

        @jax.jit
        def run(st):
            def body(s, _):
                return eng.step(s, jnp.zeros(tree.nv)), s.q[7]

            return jax.lax.scan(body, st, None, length=800)

        st, rail = run(st)
        r = shape_for_link(robot, "cube0", exact=False).radius
        gap = 0.5 + float(st.q[7])
        assert gap >= 2.0 * r - 5e-3
        assert float(jnp.min(0.5 + rail)) >= 2.0 * r - 5e-3
