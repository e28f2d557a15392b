"""Quantity manager — shared, trace-time-cached physical quantities.

Reference: gym_jiminy's QuantityManager — lazily-evaluated quantities
(CoM, ZMP, capture point, odometry pose, foot forces…) shared between
rewards/terminations/observers with automatic cache invalidation per step
(SURVEY.md §2.4 "Quantity manager").

TPU redesign: under ``jit`` the "cache" is trace-time memoization — a
``QuantityContext`` computes shared intermediates (forward kinematics,
CoM…) exactly once per compiled step no matter how many consumers ask,
and XLA CSE removes any residual duplication. Laziness is free: only the
quantities actually *traced* end up in the program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree
from jiminy_tpu.engine.engine import SimState
from jiminy_tpu.math import so3


class QuantityContext:
    """Per-step quantity evaluator over (tree, SimState).

    Create one per step evaluation; every property memoizes its value for
    the duration of the trace (the reference's per-step cache)."""

    def __init__(
        self, tree: KinematicTree, sim: SimState, gravity=9.81, ground=None
    ):
        self.tree = tree
        self.sim = sim
        self.g = gravity
        self.ground = ground  # optional: enables terrain-aware quantities
        self._cache: dict = {}

    def _memo(self, name, fn):
        if name not in self._cache:
            self._cache[name] = fn()
        return self._cache[name]

    # ---- kinematic backbone -------------------------------------------
    @property
    def kinematics(self):
        return self._memo(
            "kin", lambda: algos.kinematics(self.tree, self.sim.q, self.sim.v)
        )

    @property
    def xw(self):
        return self.kinematics[0]

    @property
    def vel(self):
        return self.kinematics[1]

    # ---- quantities ------------------------------------------------------
    @property
    def com(self) -> jax.Array:
        """Whole-body center of mass, world frame (3,)."""
        return self._memo(
            "com", lambda: algos.com_position(self.tree, self.xw)
        )

    @property
    def com_velocity(self) -> jax.Array:
        """CoM velocity, world frame (3,)."""

        def f():
            tree, xw, vel = self.tree, self.xw, self.vel
            total_m = jnp.sum(tree.inertia_mass)
            p = jnp.zeros(3, dtype=self.sim.q.dtype)
            for i in range(tree.nb):
                m = tree.inertia_mass[i]
                c_loc = jnp.where(m > 0, tree.inertia_h[i] / jnp.maximum(m, 1e-9), 0.0)
                w_l, v_l = vel[i][:3], vel[i][3:]
                v_c = xw[i].rot @ (v_l + jnp.cross(w_l, c_loc))
                p = p + m * v_c
            return p / total_m

        return self._memo("com_vel", f)

    @property
    def zmp(self) -> jax.Array:
        """Zero-moment point from contact forces (2,), world xy.

        Reference: gym_jiminy's ZeroMomentPoint quantity. Falls back to the
        CoM projection when contact forces vanish (flight phase)."""

        def f():
            tree, sim = self.tree, self.sim
            if tree.ncp == 0:
                return self.com[:2]
            pts, _ = _contact_points(tree, self.xw)
            f_z = sim.contact_forces[:, 2]
            total = jnp.sum(f_z)
            zmp = jnp.sum(pts[:, :2] * f_z[:, None], axis=0) / jnp.maximum(
                total, 1e-6
            )
            return jnp.where(total > 1e-3, zmp, self.com[:2])

        return self._memo("zmp", f)

    @property
    def capture_point(self) -> jax.Array:
        """Instantaneous capture point / DCM (2,):
        com_xy + com_vel_xy·sqrt(z_com/g). Reference: capture-point
        quantity used by stability rewards."""

        def f():
            com, v = self.com, self.com_velocity
            omega = jnp.sqrt(jnp.maximum(com[2], 1e-3) / self.g)
            return com[:2] + v[:2] * omega

        return self._memo("cp", f)

    @property
    def base_pose(self):
        """(position (3,), quaternion xyzw (4,)) of the floating base."""
        return self.sim.q[:3], self.sim.q[3:7]

    @property
    def odometry(self) -> jax.Array:
        """Planar odometry pose (x, y, yaw) (3,) — reference's odometry
        quantity for drift terminations."""

        def f():
            pos, quat = self.base_pose
            rpy = so3.quat_to_rpy(quat)
            return jnp.array([pos[0], pos[1], rpy[2]])

        return self._memo("odom", f)

    @property
    def base_velocity_world(self) -> jax.Array:
        """Base linear velocity in the WORLD frame (3,) — the reference's
        BaseOdometryAverageVelocity-style tracking quantity (here
        instantaneous; wrap in a stacked pipeline layer to average)."""

        def f():
            R = so3.quat_to_matrix(self.sim.q[3:7])
            return R @ self.sim.v[0:3]

        return self._memo("base_vw", f)

    @property
    def base_angular_velocity(self) -> jax.Array:
        """Base angular velocity in the BASE frame (3,)."""
        return self.sim.v[3:6]

    @property
    def base_height_above_ground(self) -> jax.Array:
        """Base height above the LOCAL ground surface (scalar). Uses the
        context's ground (per-env terrain under domain randomization);
        plain ``q[2]`` when no ground was attached."""

        def f():
            z = self.sim.q[2]
            if self.ground is None:
                return z
            h, _ = self.ground.query(self.sim.q[:2])
            return z - h

        return self._memo("base_h", f)

    @property
    def base_tilt(self) -> jax.Array:
        """cos(tilt angle) of the base z-axis vs world up (scalar, 1 when
        level) — the safety-termination quantity."""

        def f():
            R = so3.quat_to_matrix(self.sim.q[3:7])
            return R[2, 2]

        return self._memo("tilt", f)

    @property
    def contact_points(self) -> jax.Array:
        """World positions of all contact points (ncp, 3)."""
        return self._memo(
            "cpts", lambda: _contact_points(self.tree, self.xw)[0]
        )

    @property
    def total_contact_force(self) -> jax.Array:
        """Summed world contact force (3,)."""
        return self._memo(
            "fc", lambda: jnp.sum(self.sim.contact_forces, axis=0)
        )

    @property
    def energy(self):
        """(kinetic, potential)."""
        return self._memo(
            "energy", lambda: algos.energy(self.tree, self.sim.q, self.sim.v)
        )

    def frame_pose(self, frame: int):
        """World Transform of an operational frame."""
        return self._memo(
            f"fp{frame}",
            lambda: self.xw[self.tree.frame_body[frame]].compose(
                self.tree.frame_placement(frame)
            ),
        )

    def support_polygon_margin(
        self, point: jax.Array | None = None, n_directions: int = 16
    ) -> jax.Array:
        """Signed distance from ``point`` (default: ZMP) to the support
        polygon of LOADED contact points — positive inside (stable).

        Reference: gym_jiminy toolbox's convex-hull support polygon.
        Convex hulls don't jit (data-dependent vertex counts), so this
        uses the support-function formulation: margin =
        min_θ [ max_k (c_k − p)·u(θ) ] over ``n_directions`` directions —
        exact as n_directions → ∞, vectorized and vmappable."""

        def f():
            p = self.zmp if point is None else point
            pts = self.contact_points[:, :2]
            loaded = self.sim.contact_forces[:, 2] > 1e-3
            th = jnp.linspace(
                0.0, 2.0 * jnp.pi, n_directions, endpoint=False
            )
            U = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=1)  # (D, 2)
            proj = (pts - p) @ U.T  # (ncp, D)
            proj = jnp.where(loaded[:, None], proj, -jnp.inf)
            return jnp.min(jnp.max(proj, axis=0))

        key = "spm" if point is None else None
        return self._memo(key, f) if key else f()


def _contact_points(tree, xw):
    ps = []
    for k in range(tree.ncp):
        b = tree.contact_body[k]
        ps.append(xw[b].apply(tree.contact_pos[k]))
    return (
        jnp.stack(ps) if ps else jnp.zeros((0, 3)),
        None,
    )
