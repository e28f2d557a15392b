"""Sensor suite: measurement generation with delay, bias and noise.

Reference: jiminy's ``AbstractSensorTpl`` CRTP hierarchy — per-type shared
data batches, interpolated *delay*, additive *bias*, Gaussian *noise* and a
fixed update period (SURVEY.md §2.1 "Sensors"). Types replicated here:

- ``imu``     — quat (4, xyzw), gyro (3), accel (3) at an operational frame
- ``encoder`` — joint position + velocity (2)
- ``effort``  — actuated joint torque (1)
- ``contact`` — 3-D contact force at a contact point, body frame
- ``force``   — 6-D wrench [torque; force] aggregated at a frame

TPU-first: each type is one stacked (ns, dim) computation; the delay line
is a per-type ring buffer (ns, buf_len, dim) rolled in-device — the sensor
state lives inside the env-state pytree, so delays survive checkpointing
for free (SURVEY.md §2.7 item 4 "ring-buffer arrays in the env state").
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, KinematicTree
from jiminy_tpu.math import so3


SENSOR_DIMS = {"imu": 10, "encoder": 2, "effort": 1, "contact": 3, "force": 6}
# noise/bias dimensionality (imu: 3 rot-vec + 3 gyro + 3 accel)
NOISE_DIMS = {"imu": 9, "encoder": 2, "effort": 1, "contact": 3, "force": 6}


def _static(default=None):
    return struct.field(pytree_node=False, default=default)


def imu_spec(frame: str, delay=0.0, bias=0.0, noise_std=0.0, name=None):
    return dict(type="imu", target=frame, delay=delay, bias=bias,
                noise_std=noise_std, name=name or f"imu_{frame}")


def encoder_spec(joint: str, delay=0.0, bias=0.0, noise_std=0.0, name=None):
    return dict(type="encoder", target=joint, delay=delay, bias=bias,
                noise_std=noise_std, name=name or f"encoder_{joint}")


def effort_spec(joint: str, delay=0.0, bias=0.0, noise_std=0.0, name=None):
    return dict(type="effort", target=joint, delay=delay, bias=bias,
                noise_std=noise_std, name=name or f"effort_{joint}")


def contact_spec(contact: str, delay=0.0, bias=0.0, noise_std=0.0, name=None):
    return dict(type="contact", target=contact, delay=delay, bias=bias,
                noise_std=noise_std, name=name or f"contact_{contact}")


def force_spec(frame: str, delay=0.0, bias=0.0, noise_std=0.0, name=None):
    return dict(type="force", target=frame, delay=delay, bias=bias,
                noise_std=noise_std, name=name or f"force_{frame}")


class SensorGroup(struct.PyTreeNode):
    """All sensors of one type, stacked."""

    type: str = _static()
    target: tuple = _static()  # per-sensor index (frame/joint/contact)
    name: tuple = _static()
    buf_len: int = _static(2)
    delay: jax.Array = None  # (ns,) seconds
    bias: jax.Array = None  # (ns, noise_dim)
    noise_std: jax.Array = None  # (ns, noise_dim)

    @property
    def ns(self) -> int:
        return len(self.target)


class SensorSuite:
    """Builds measurement/update/read pure functions for a robot's sensors.

    The suite is configured once (static); the mutable part — ring buffers —
    is a pytree managed by the caller (env/simulator state)."""

    def __init__(self, tree: KinematicTree, groups: Sequence[SensorGroup],
                 period: float):
        self.tree = tree
        self.groups = list(groups)
        self.period = float(period)

    # -- construction -----------------------------------------------------
    @staticmethod
    def build(tree: KinematicTree, specs: Sequence[dict], period: float,
              ) -> "SensorSuite":
        """Assemble from a list of *_spec dicts, resolving names → indices
        (the analog of attaching sensors from a hardware TOML —
        SURVEY.md §2.3 "Robot auto-build")."""
        by_type: dict[str, list[dict]] = {}
        for s in specs:
            by_type.setdefault(s["type"], []).append(s)
        groups = []
        for typ, ss in by_type.items():
            targets, names, delays, biases, noises = [], [], [], [], []
            ndim = NOISE_DIMS[typ]
            for s in ss:
                t = s["target"]
                if typ in ("imu", "force"):
                    idx = tree.frame_index(t) if isinstance(t, str) else int(t)
                elif typ in ("encoder", "effort"):
                    idx = tree.joint_index(t) if isinstance(t, str) else int(t)
                else:  # contact
                    idx = (
                        tree.contact_frame_name.index(t)
                        if isinstance(t, str)
                        else int(t)
                    )
                targets.append(idx)
                names.append(s["name"])
                delays.append(float(s.get("delay", 0.0)))
                biases.append(
                    np.broadcast_to(
                        np.asarray(s.get("bias", 0.0), np.float32), (ndim,)
                    )
                )
                noises.append(
                    np.broadcast_to(
                        np.asarray(s.get("noise_std", 0.0), np.float32), (ndim,)
                    )
                )
            max_delay = max(delays)
            buf_len = int(math.ceil(max_delay / period)) + 2
            groups.append(
                SensorGroup(
                    type=typ,
                    target=tuple(targets),
                    name=tuple(names),
                    buf_len=buf_len,
                    delay=jnp.asarray(delays, jnp.float32),
                    bias=jnp.asarray(np.stack(biases)),
                    noise_std=jnp.asarray(np.stack(noises)),
                )
            )
        return SensorSuite(tree, groups, period)

    # -- raw measurement ---------------------------------------------------
    def _measure_group(self, g: SensorGroup, q, v, a, f_contact, tau,
                       kin) -> jax.Array:
        """Noise-free raw measurement (ns, dim)."""
        tree = self.tree
        xw, vel, acc = kin
        rows = []
        if g.type == "imu":
            for f in g.target:
                b = tree.frame_body[f]
                pose = xw[b].compose(tree.frame_placement(f))
                quat = so3.matrix_to_quat(pose.rot)
                Rfp = tree.fp_rot[f]
                p = tree.fp_pos[f]
                w_b, v_b = vel[b][:3], vel[b][3:]
                al_b, aa_b = acc[b][:3], acc[b][3:]
                # classical proper acceleration of the frame origin, body
                # coords: a_lin + ω×v_lin + α×p + ω×(ω×p)
                a_pt = (
                    aa_b
                    + jnp.cross(w_b, v_b)
                    + jnp.cross(al_b, p)
                    + jnp.cross(w_b, jnp.cross(w_b, p))
                )
                gyro = Rfp.T @ w_b
                accel = Rfp.T @ a_pt
                rows.append(jnp.concatenate([quat, gyro, accel]))
        elif g.type == "encoder":
            for j in g.target:
                rows.append(
                    jnp.stack([q[tree.q_off[j]], v[tree.v_off[j]]])
                )
        elif g.type == "effort":
            for j in g.target:
                rows.append(tau[tree.v_off[j]][None])
        elif g.type == "contact":
            for k in g.target:
                b = tree.contact_body[k]
                rows.append(xw[b].rot.T @ f_contact[k])
        elif g.type == "force":
            for f in g.target:
                b = tree.frame_body[f]
                pose = xw[b].compose(tree.frame_placement(f))
                force = jnp.zeros(3, dtype=q.dtype)
                torque = jnp.zeros(3, dtype=q.dtype)
                for k in range(tree.ncp):
                    if tree.contact_body[k] != b:
                        continue
                    p_w = xw[b].apply(tree.contact_pos[k])
                    force = force + f_contact[k]
                    torque = torque + jnp.cross(p_w - pose.pos, f_contact[k])
                rows.append(
                    jnp.concatenate([pose.rot.T @ torque, pose.rot.T @ force])
                )
        else:
            raise ValueError(g.type)
        return jnp.stack(rows)

    def _corrupt(
        self, g: SensorGroup, raw: jax.Array, key, bias_extra=None
    ) -> jax.Array:
        """Apply bias + Gaussian noise (reference sensor model order:
        measurement → bias → noise). ``bias_extra`` optionally adds a
        per-env calibration offset (ns, dim) on top of the spec bias —
        the sensor axis of domain randomization
        (engine/randomization.ModelRandomization.sample_sensor_bias)."""
        bias = g.bias if bias_extra is None else g.bias + bias_extra
        eps = bias + g.noise_std * jax.random.normal(key, g.noise_std.shape)
        if g.type == "imu":
            # quaternion corrupted by a rotation-vector perturbation
            def rot_one(quat, rv):
                return so3.quat_mul(quat, so3.quat_exp(rv))

            quat = jax.vmap(rot_one)(raw[:, :4], eps[:, :3])
            rest = raw[:, 4:] + eps[:, 3:]
            return jnp.concatenate([quat, rest], axis=1)
        return raw + eps

    # -- state management --------------------------------------------------
    def init_buffers(self) -> tuple:
        """Zero-filled ring buffers (most recent sample at index 0)."""
        return tuple(
            jnp.zeros((g.ns, g.buf_len, SENSOR_DIMS[g.type]))
            for g in self.groups
        )

    def measure_all(self, q, v, a, f_contact, tau):
        kin = algos.body_accelerations(self.tree, q, v, a)
        return [
            self._measure_group(g, q, v, a, f_contact, tau, kin)
            for g in self.groups
        ]

    def reset(
        self, key, q, v, a=None, f_contact=None, tau=None,
        bias_extra=None,
    ) -> tuple:
        """Buffers filled with the initial measurement (the reference
        initializes sensor data at Engine.start — SURVEY.md §3.1)."""
        a = jnp.zeros(self.tree.nv) if a is None else a
        tau = jnp.zeros(self.tree.nv) if tau is None else tau
        if f_contact is None:
            f_contact = jnp.zeros((self.tree.ncp, 3))
        raws = self.measure_all(q, v, a, f_contact, tau)
        bufs = []
        for gi, (g, raw) in enumerate(zip(self.groups, raws)):
            key, k = jax.random.split(key)
            be = bias_extra[gi] if bias_extra is not None else None
            m = self._corrupt(g, raw, k, bias_extra=be)
            bufs.append(jnp.tile(m[:, None, :], (1, g.buf_len, 1)))
        return tuple(bufs)

    def update(
        self, bufs: tuple, key, q, v, a, f_contact, tau,
        bias_extra=None,
    ) -> tuple:
        """Push one new (biased, noisy) sample per sensor into the delay
        lines. Call every ``period`` seconds of sim time."""
        raws = self.measure_all(q, v, a, f_contact, tau)
        out = []
        for gi, (g, buf, raw) in enumerate(
            zip(self.groups, bufs, raws)
        ):
            key, k = jax.random.split(key)
            be = bias_extra[gi] if bias_extra is not None else None
            m = self._corrupt(g, raw, k, bias_extra=be)
            buf = jnp.roll(buf, 1, axis=1).at[:, 0, :].set(m)
            out.append(buf)
        return tuple(out)

    def read(self, bufs: tuple) -> dict[str, jax.Array]:
        """Delayed measurements: linear interpolation in the ring buffer at
        each sensor's ``delay`` (reference: jitter-free interpolated delay,
        SURVEY.md §2.1 "Sensors"). Returns {type: (ns, dim)}.

        Indices resolve STATICALLY when delays are concrete (the common
        case) — index-array gathers are miscompiled by the current TPU
        backend (see engine/solver.py)."""
        import numpy as np

        out = {}
        for g, buf in zip(self.groups, bufs):
            try:  # static path: delays are concrete at trace time
                steps_np = np.asarray(g.delay) / self.period
                i0_np = np.clip(
                    np.floor(steps_np).astype(np.int32), 0, g.buf_len - 2
                )
                frac = jnp.asarray(
                    (steps_np - i0_np)[:, None].astype(np.float32)
                )
                m0 = jnp.stack([buf[s, int(i0_np[s])] for s in range(g.ns)])
                m1 = jnp.stack(
                    [buf[s, int(i0_np[s]) + 1] for s in range(g.ns)]
                )
            except (jax.errors.TracerArrayConversionError, TypeError):
                steps = g.delay / self.period
                i0 = jnp.clip(
                    jnp.floor(steps).astype(jnp.int32), 0, g.buf_len - 2
                )
                frac = (steps - i0)[:, None]
                idx = jnp.arange(g.ns)
                m0 = buf[idx, i0]  # (ns, dim)
                m1 = buf[idx, i0 + 1]
            m = (1.0 - frac) * m0 + frac * m1
            if g.type == "imu":
                # renormalize the nlerp'd quaternion block
                quat = m[:, :4]
                quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
                m = jnp.concatenate([quat, m[:, 4:]], axis=1)
            out[g.type] = m
        return out

    def names(self, typ: str) -> tuple:
        for g in self.groups:
            if g.type == typ:
                return g.name
        return ()

    # -- in-kernel sensor-stage plumbing (ops/substep_kernel.py) ----------
    def flatten_buffers(self, bufs: tuple) -> jax.Array:
        """Ring buffers → one flat (n_buf,) vector in the kernel's
        [group][sensor][slot][dim] lane order."""
        return jnp.concatenate([b.reshape(-1) for b in bufs])

    def unflatten_buffers(self, flat: jax.Array) -> tuple:
        out, o = [], 0
        for g in self.groups:
            d = SENSOR_DIMS[g.type]
            n = g.ns * g.buf_len * d
            out.append(flat[o:o + n].reshape(g.ns, g.buf_len, d))
            o += n
        return tuple(out)

    def sample_eps(self, key, bias_extra=None) -> jax.Array:
        """ONE update's corruption lanes, flattened (n_eps,) — exactly
        ``_corrupt``'s realization (same per-group key-split order), so
        the in-kernel sensor stage reproduces the XLA path's noise
        bit-for-bit given the same chunk key."""
        parts = []
        for gi, g in enumerate(self.groups):
            key, k = jax.random.split(key)
            be = bias_extra[gi] if bias_extra is not None else 0.0
            parts.append(
                (
                    g.bias + be
                    + g.noise_std * jax.random.normal(k, g.noise_std.shape)
                ).reshape(-1)
            )
        return jnp.concatenate(parts)
