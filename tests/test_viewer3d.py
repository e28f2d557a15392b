"""3-D viewer (jiminy_tpu/viewer3d.py) — VERDICT r1 missing #5:
geometry-level replay with camera control and video, replacing the
skeleton-only orthographic viewer for parity with the reference's
meshcat/panda3d Viewer (SURVEY.md §2.3 "Viewer / replay").

Pins: primitive tessellation validity, binary+ASCII STL parsing with
scale, URDF <visual> → display geometry resolution (with package://
mesh fallback), auto-skeleton for bare trees, HTML payload integrity,
and GIF recording.
"""

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from jiminy_tpu import viewer3d
from jiminy_tpu.models import make_anymal
from jiminy_tpu.models.quadruped import stand_q


@pytest.fixture(scope="module")
def anymal():
    return make_anymal()


@pytest.fixture
def tet_stl(tmp_path):
    tris = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[0, 0, 0], [0, 0, 1], [1, 0, 0]],
            [[0, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
        ],
        np.float32,
    )
    buf = b"\x00" * 80 + struct.pack("<I", 4)
    for t in tris:
        buf += b"\x00" * 12
        for v in t:
            buf += struct.pack("<3f", *v)
        buf += b"\x00\x00"
    p = tmp_path / "tet.stl"
    p.write_bytes(buf)
    return p


class TestTessellation:
    @pytest.mark.parametrize(
        "mesh",
        [
            viewer3d.uv_sphere(0.1, (0, 0, 0.5)),
            viewer3d.tube((0, 0, 0), (0, 0.2, 0), 0.05, caps="round"),
            viewer3d.tube((0, 0, 0), (0.3, 0, 0), 0.04, caps="flat"),
            viewer3d.box_mesh(np.eye(3), (0, 0, 0), (0.2, 0.1, 0.05)),
        ],
        ids=["sphere", "capsule", "cylinder", "box"],
    )
    def test_meshes_valid_and_closed(self, mesh):
        v, f = mesh
        assert f.min() >= 0 and f.max() < len(v)
        # closed orientable surface: every edge shared by exactly 2
        # faces with opposite directions
        edges = {}
        for tri in f:
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                edges[(a, b)] = edges.get((a, b), 0) + 1
        for (a, b), n in edges.items():
            assert n == 1, "duplicate directed edge"
            assert edges.get((b, a)) == 1, "boundary edge (mesh not closed)"

    def test_outward_winding(self):
        """Signed volume positive → faces wound outward (backface cull
        and shading depend on it)."""
        for v, f in (
            viewer3d.uv_sphere(0.5, (0, 0, 0)),
            viewer3d.tube((0, 0, -0.2), (0, 0, 0.2), 0.1),
            viewer3d.box_mesh(np.eye(3), (0, 0, 0), (1, 1, 1)),
        ):
            vol = 0.0
            for a, b, c in f:
                vol += np.dot(v[a], np.cross(v[b], v[c])) / 6
            assert vol > 0, vol

    def test_sphere_radius(self):
        v, _ = viewer3d.uv_sphere(0.25, (1, 2, 3))
        r = np.linalg.norm(v - [1, 2, 3], axis=1)
        np.testing.assert_allclose(r, 0.25, atol=1e-6)


class TestStl:
    def test_binary_with_scale(self, tet_stl):
        v, f = viewer3d.read_stl(tet_stl, scale=2.0)
        assert v.shape == (12, 3) and f.shape == (4, 3)
        assert v.max() == 2.0

    def test_ascii(self, tet_stl, tmp_path):
        vb, _ = viewer3d.read_stl(tet_stl)
        asc = "solid t\n"
        for tri in vb.reshape(4, 3, 3):
            asc += " facet normal 0 0 0\n  outer loop\n"
            for p in tri:
                asc += f"   vertex {p[0]} {p[1]} {p[2]}\n"
            asc += "  endloop\n endfacet\nendsolid t\n"
        p = tmp_path / "t.stl"
        p.write_text(asc)
        va, _ = viewer3d.read_stl(p)
        np.testing.assert_allclose(va, vb)

    def test_decimation_bound(self, tet_stl):
        v, f = viewer3d.read_stl(tet_stl)
        v2, f2 = viewer3d._decimate(v, f, 2)
        assert len(f2) <= 2 and f2.max() < len(v2)


URDF_VIS = """<?xml version="1.0"?>
<robot name="vis">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <visual><origin xyz="0 0 0.1"/>
      <geometry><box size="0.2 0.1 0.05"/></geometry></visual>
    <visual>
      <geometry><mesh filename="package://tet.stl" scale="0.5 0.5 0.5"/>
      </geometry></visual>
    <visual><origin xyz="0.1 0 0" rpy="0 1.5707963 0"/>
      <geometry><cylinder radius="0.03" length="0.2"/></geometry></visual>
  </link>
</robot>
"""


class TestDisplayGeometry:
    def test_urdf_visuals_resolved(self, tet_stl):
        from jiminy_tpu.robot import build_robot

        robot = build_robot(URDF_VIS, hardware={}, freeflyer=True)
        assert robot.visuals and 0 in robot.visuals
        types = [g["type"] for g in robot.visuals[0]]
        assert types == ["box", "mesh", "cylinder"]
        geo = viewer3d.display_geometry(
            robot.tree, robot.visuals, mesh_dir=tet_stl.parent
        )
        assert len(geo[0]) == 3  # mesh file found and tessellated

    def test_missing_mesh_falls_back_to_skeleton(self):
        from jiminy_tpu.robot import build_robot

        robot = build_robot(URDF_VIS, hardware={}, freeflyer=True)
        geo = viewer3d.display_geometry(robot.tree, robot.visuals)
        # box + cylinder survive; the unresolvable mesh is skipped
        assert len(geo[0]) == 2

    def test_auto_skeleton_covers_all_bodies(self, anymal):
        geo = viewer3d.auto_skeleton_geometry(anymal.tree)
        assert set(geo) == set(range(anymal.tree.nb))
        assert all(len(g) >= 1 for g in geo.values())


class TestReplayOutputs:
    @pytest.fixture(scope="class")
    def traj(self, anymal):
        q0 = np.asarray(stand_q(anymal.tree))
        qs = np.tile(q0, (20, 1))
        qs[:, 2] += 0.03 * np.sin(np.linspace(0, 2 * np.pi, 20))
        return qs

    def test_html_payload(self, anymal, traj, tmp_path):
        out = tmp_path / "r.html"
        viewer3d.replay_html3d(anymal, traj, out, dt=0.02)
        html = out.read_text()
        payload = html.split("__DATA__" if "__DATA__" in html else "const D = ")[1]
        data = json.loads(payload.split(";\n")[0])
        assert len(data["pos"]) == 20
        assert len(data["quat"][0]) == anymal.tree.nb
        assert data["geoms"] and data["ground"]["z"]
        # quats normalized
        q = np.asarray(data["quat"])
        np.testing.assert_allclose(
            np.linalg.norm(q, axis=-1), 1.0, atol=1e-3
        )
        # interactive controls shipped
        for snippet in ("onmousedown", "onwheel", "camBasis", "id=\"spd\""):
            assert snippet in html, snippet
        # JS structure balance
        js = html.split("<script>")[1].split("</script>")[0]
        for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
            assert js.count(o) == js.count(c)

    def test_gif_records(self, anymal, traj, tmp_path):
        from PIL import Image

        out = tmp_path / "r.gif"
        viewer3d.record_gif3d(
            anymal.tree, traj, out, max_frames=4,
            turntable_deg_per_s=30.0,
        )
        im = Image.open(out)
        assert im.n_frames == 4
        # the robot actually rendered: scene not all background
        arr = np.asarray(im.convert("RGB"))
        assert (arr.reshape(-1, 3).max(0) > 100).any()


class TestSimulatorConveniences:
    """Reference-parity Simulator.render/replay/plot entry points and
    the capture-point replay marker (SURVEY.md §2.3 Simulator row,
    Viewer marker set)."""

    def test_render_replay_plot_and_cp_marker(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from jiminy_tpu.models.quadruped import stand_q
        from jiminy_tpu.simulator import Simulator

        robot = make_anymal()
        tree = robot.tree
        q0 = jnp.asarray(stand_q(tree))
        qm0, _ = robot.motors.joint_state(q0, jnp.zeros(tree.nv))

        def pd(q, v, t):
            qm, vm = robot.motors.joint_state(q, v)
            return 80.0 * (qm0 - qm) - 2.0 * vm

        sim = Simulator(robot)
        final, log = sim.simulate(
            0.3, q0=q0, v0=jnp.zeros(tree.nv), controller=pd
        )
        fr = sim.render(q0)
        assert fr.shape == (480, 480, 3) and fr.dtype == np.uint8
        sim.replay(log, tmp_path / "r.html")
        sim.plot(log, tmp_path / "p.html")
        html = (tmp_path / "r.html").read_text()
        data = json.loads(html.split("const D = ")[1].split(";\n")[0])
        assert "cp" in data and len(data["cp"]) == len(data["com"])
        # quasi-static stance: capture point tracks the CoM footprint
        cp = np.asarray(data["cp"])
        com = np.asarray(data["com"])
        assert float(np.max(np.abs(cp[-5:, :2] - com[-5:, :2]))) < 0.05
