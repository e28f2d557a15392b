"""Trajectory/State types and dynamics helpers.

Reference: jiminy_py's ``dynamics.py`` — Trajectory/State containers,
CoM/capture-point/ZMP utilities and frame-pose helpers (SURVEY.md §2.3
"Dynamics helpers"). The physical quantities live in
:mod:`jiminy_tpu.envs.quantities`; this module provides the trajectory
container with Lie-group-correct time interpolation and log extraction.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree


@dataclass
class Trajectory:
    """A time-indexed trajectory of robot states (reference: Trajectory /
    State used for replay and tracking rewards)."""

    tree: KinematicTree
    times: np.ndarray  # (T,)
    qs: np.ndarray  # (T, nq)
    vs: np.ndarray | None = None  # (T, nv)

    def __len__(self) -> int:
        return len(self.times)

    @property
    def duration(self) -> float:
        return float(self.times[-1] - self.times[0])

    def at(self, t: float):
        """(q, v) interpolated at time t — configurations interpolate on
        the Lie group (q0 ⊕ frac·(q1 ⊖ q0)), velocities linearly."""
        t = float(np.clip(t, self.times[0], self.times[-1]))
        i = int(np.searchsorted(self.times, t, side="right") - 1)
        i = min(max(i, 0), len(self.times) - 2)
        t0, t1 = self.times[i], self.times[i + 1]
        frac = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
        q0 = jnp.asarray(self.qs[i])
        q1 = jnp.asarray(self.qs[i + 1])
        dq = algos.difference(self.tree, q0, q1)
        q = algos.integrate(self.tree, q0, dq, frac)
        v = None
        if self.vs is not None:
            v = jnp.asarray((1 - frac) * self.vs[i] + frac * self.vs[i + 1])
        return q, v

    @staticmethod
    def from_log(tree: KinematicTree, log) -> "Trajectory":
        """Extract from a telemetry log's q.*/v.* columns (reference:
        extract_trajectory_from_log)."""

        def cols(prefix, n):
            names = [f"{prefix}.{i}" for i in range(n)]
            if not all(name in log.columns for name in names):
                return None
            return np.stack([np.asarray(log.columns[c]) for c in names], 1)

        qs = cols("q", tree.nq)
        if qs is None:
            raise KeyError("log has no q.* columns")
        return Trajectory(
            tree=tree,
            times=np.asarray(log.time),
            qs=qs,
            vs=cols("v", tree.nv),
        )
