"""Generate ANALYTIC parity fixtures — trajectories computed in closed
form (numpy, no engine), so the comparator pins the engine against
physics truth rather than against itself (VERDICT r3 next #10).

Two fixtures:

- ``ball_drop_impact``: restitution-free impact. Exact discrete
  semi-implicit free fall (v += -g dt; z += v dt) until the contact
  constraint activates; the velocity-barrier activation lands the point
  EXACTLY on the surface (vz clamped to -z/dt at the crossing step) and
  holds it there — closed form for every sample.
- ``wheel_roll_no_slip``: a wheel with a WheelConstraint rolling without
  slip at constant speed: x(t) = omega R t, theta(t) = omega t, z = R,
  world velocity constant. q/v tables from the closed form (quaternion
  about +y; free-flyer v in LOCAL frame per the Pinocchio convention).

Run: ``python parity/make_analytic_fixtures.py`` then
``python -m jiminy_tpu.parity run "parity/fixtures/*"``.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

HERE = pathlib.Path(__file__).parent
G = 9.81

BALL_URDF = """<robot name="ball">
  <link name="ball">
    <inertial>
      <mass value="1.0"/>
      <inertia ixx="0.004" iyy="0.004" izz="0.004" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
</robot>
"""

WHEEL_URDF = """<robot name="wheel">
  <link name="wheel">
    <inertial>
      <mass value="2.0"/>
      <inertia ixx="0.02" iyy="0.04" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
</robot>
"""


def ball_drop_impact(dt=1e-3, z0=0.2, t_end=0.6):
    """Exact discrete trajectory of the point-contact drop."""
    n = int(round(t_end / dt))
    z = np.empty(n + 1)
    vz = np.empty(n + 1)
    z[0], vz[0] = z0, 0.0
    for k in range(n):
        v_free = vz[k] - G * dt
        z_free = z[k] + v_free * dt
        if z_free < 0.0:
            # velocity barrier: may approach but not cross this substep
            # (vz clamped to -z/dt; at rest z=0 that clamps to 0)
            v_free = -z[k] / dt
            z_free = 0.0
        z[k + 1], vz[k + 1] = z_free, v_free
    t = np.arange(n + 1) * dt
    nq, nv = 7, 6
    q = np.zeros((n + 1, nq))
    q[:, 2] = z
    q[:, 6] = 1.0  # identity quat (xyzw)
    v = np.zeros((n + 1, nv))
    v[:, 2] = vz  # free fall is world == local (identity orientation)
    fix = HERE / "fixtures" / "ball_drop_impact"
    fix.mkdir(parents=True, exist_ok=True)
    (fix / "robot.urdf").write_text(BALL_URDF)
    (fix / "hardware.toml").write_text(
        '[Global]\ncontactFrameNames = ["ball"]\n'
    )
    np.savez(fix / "traj.npz", t=t, q=q, v=v)
    meta = {
        "name": "ball_drop_impact",
        "source": "analytic-closed-form",
        "freeflyer": True,
        "quat_convention": "xyzw",
        "engine_options": {
            "dt": dt,
            "solver": "euler_symplectic",
            "contact_model": "constraint",
            "pgs_iters": 16,
            "contact_slop": 0.0,
        },
        "tolerance_q": 1e-7,
        "tolerance_v": 2e-5,
        "duration": t_end,
        "notes": "restitution-free impact vs exact discrete closed form. "
        "Only the impact sample deviates (~7e-6 of the 1.1 m/s impact "
        "dv): the PGS Tikhonov regularization (pgs_reg=1e-6) slightly "
        "under-resolves the impulse; every other sample matches to "
        "<1e-8 (q) / <1e-6 (v).",
    }
    (fix / "meta.json").write_text(json.dumps(meta, indent=2))
    return fix


def wheel_roll_no_slip(dt=2e-4, radius=0.2, omega=3.0, t_end=1.0,
                       stride=25):
    """Closed-form rolling: theta = omega t, x = omega R t, z = R.

    Semi-implicit integration transports the LOCAL free-flyer velocity
    with a one-step-lagged rotation, so the discrete trajectory differs
    from the continuous closed form at O(omega·dt) in v and
    O(omega²·R·t·dt) in x — dt=2e-4 keeps that gap under the pin
    tolerances while the fixture still spans a full second of rolling.
    Samples every ``stride`` steps (times stay multiples of dt)."""
    n = int(round(t_end / dt))
    t = np.arange(0, n + 1, stride) * dt
    theta = omega * t
    m = len(t)
    nq, nv = 7, 6
    q = np.zeros((m, nq))
    q[:, 0] = omega * radius * t
    q[:, 2] = radius
    # quaternion about +y, xyzw
    q[:, 4] = np.sin(theta / 2.0)
    q[:, 6] = np.cos(theta / 2.0)
    v = np.zeros((m, nv))
    # free-flyer linear velocity is LOCAL: R_y(theta)^T (omega R, 0, 0)
    # R_y(th) e_x = (cos th, 0, -sin th)  =>  R^T v_w = (v cos, 0, v sin)
    vx_w = omega * radius
    v[:, 0] = vx_w * np.cos(theta)
    v[:, 2] = vx_w * np.sin(theta)
    v[:, 4] = omega  # local angular velocity about the wheel axis
    fix = HERE / "fixtures" / "wheel_roll_no_slip"
    fix.mkdir(parents=True, exist_ok=True)
    (fix / "robot.urdf").write_text(WHEEL_URDF)
    np.savez(fix / "traj.npz", t=t, q=q, v=v)
    meta = {
        "name": "wheel_roll_no_slip",
        "source": "analytic-closed-form",
        "freeflyer": True,
        "quat_convention": "xyzw",
        "engine_options": {
            "dt": dt,
            "solver": "euler_symplectic",
            "contact_model": "constraint",
            "pgs_iters": 64,
        },
        "constraints": [
            {
                "type": "wheel",
                "frame": "wheel_frame",
                "radius": radius,
                "axis": [0.0, 1.0, 0.0],
                "baumgarte_freq": 20.0,
            }
        ],
        "tolerance_q": 8e-4,
        "tolerance_v": 2.5e-3,
        "duration": t_end,
        "notes": "rolling without slip vs CONTINUOUS closed form. The "
        "first-order semi-implicit integrator accumulates a secular "
        "phase error ~omega^2*dt*t (0.18% at dt=2e-4 over 1 s); q and "
        "v drift together by exactly that phase (measured 4.5e-4 in q, "
        "1.8e-3 in v = v*phase), which the tolerances pin. A slipping "
        "or wrong-radius wheel misses x by ~R*omega*t — three orders "
        "larger.",
    }
    (fix / "meta.json").write_text(json.dumps(meta, indent=2))
    return fix


CONICAL_URDF = """<robot name="conical">
  <link name="anchor">
    <inertial>
      <mass value="0.0"/>
      <inertia ixx="0" iyy="0" izz="0" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="bob_joint" type="floating">
    <parent link="anchor"/><child link="bob"/>
  </joint>
  <link name="bob">
    <inertial>
      <mass value="1.0"/>
      <inertia ixx="1e-6" iyy="1e-6" izz="1e-6" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
</robot>
"""


def conical_pendulum_loop(dt=2e-4, L=1.0, theta=0.5, t_end=1.0,
                          stride=25):
    """Closed-loop (DistanceConstraint) analytic fixture — the least
    analytically-covered subsystem (VERDICT r4 next #10). A point bob on
    a free joint, rod-constrained (equality PGS row) to a WORLD frame:
    the conical pendulum. At the steady circular solution the closed
    form holds at ANY amplitude: omega^2 = g / (L cos theta),
    p(t) = (r cos omega t, r sin omega t, -L cos theta), r = L sin
    theta; the bob orientation stays identity (the rod force passes
    through the body origin), so LOCAL velocity == world velocity.
    Also pins the world-anchored-frame path (frame_body = -1), whose
    silent xw[-1] aliasing this fixture caught in round 5."""
    omega = float(np.sqrt(G / (L * np.cos(theta))))
    r = L * np.sin(theta)
    n = int(round(t_end / dt))
    t = np.arange(0, n + 1, stride) * dt
    ph = omega * t
    m = len(t)
    q = np.zeros((m, 7))
    q[:, 0] = r * np.cos(ph)
    q[:, 1] = r * np.sin(ph)
    q[:, 2] = -L * np.cos(theta)
    q[:, 6] = 1.0
    v = np.zeros((m, 6))
    v[:, 0] = -r * omega * np.sin(ph)
    v[:, 1] = r * omega * np.cos(ph)
    fix = HERE / "fixtures" / "conical_pendulum_loop"
    fix.mkdir(parents=True, exist_ok=True)
    (fix / "robot.urdf").write_text(CONICAL_URDF)
    # explicit empty hardware: the default-hardware heuristic would put
    # a contact point on the leaf bob, which hangs BELOW z=0 here
    (fix / "hardware.toml").write_text(
        "[Global]\ncontactFrameNames = []\n"
    )
    np.savez(fix / "traj.npz", t=t, q=q, v=v)
    meta = {
        "name": "conical_pendulum_loop",
        "source": "analytic-closed-form",
        # the anchor root fuses into the world; the bob's floating
        # joint provides the 6 DoF — no extra freeflyer
        "freeflyer": False,
        "quat_convention": "xyzw",
        "engine_options": {
            "dt": dt,
            "solver": "euler_symplectic",
            "contact_model": "constraint",
            "pgs_iters": 64,
        },
        "constraints": [
            {
                "type": "distance",
                "frame1": "anchor",
                "frame2": "bob_frame",
                "distance": L,
                "baumgarte_freq": 20.0,
            }
        ],
        "tolerance_q": 3e-4,
        "tolerance_v": 1e-3,
        "duration": t_end,
        "notes": "conical pendulum vs CONTINUOUS closed form: the "
        "discrete orbit nutates slightly against the continuous circle "
        "(the exact circular IC is not exactly on the discrete orbit), "
        "giving an OSCILLATORY drift that peaks at 1.46e-4 in q near "
        "t=0.5 s and returns to 1.4e-5 by t=1 s; rod length holds to "
        "2e-6 throughout (dt=2e-4). A broken equality row misses by "
        "the full free-fall displacement (~5 m) — four orders larger. "
        "Also pins the world-anchored frame path (frame_body = -1): "
        "before the round-5 fix xw[-1] silently aliased the LAST body "
        "and the constraint no-opped.",
    }
    (fix / "meta.json").write_text(json.dumps(meta, indent=2))
    return fix


if __name__ == "__main__":
    a = ball_drop_impact()
    b = wheel_roll_no_slip()
    c = conical_pendulum_loop()
    print("wrote", a, b, "and", c)
