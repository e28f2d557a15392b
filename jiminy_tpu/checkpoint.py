"""Checkpoint/resume: whole-training-state snapshots via Orbax.

Reference: jiminy does not checkpoint mid-simulation — it serializes the
robot+options into log headers and relies on RLlib checkpoints for
training (SURVEY.md §5 "Checkpoint/resume"). Here the ENTIRE state —
env batch pytree, learner params, optimizer state, RNG keys — is one
pytree, so exact resume is a single save/restore; this is also the
failure-recovery unit for multi-host runs (§5 "Failure detection":
checkpoint-restart via Orbax).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _strip_empty(state):
    """Orbax cannot serialize zero-size arrays (e.g. an ncp=0 robot's
    contact forces); replace them with a scalar placeholder — their
    values are vacuous, shapes come back from the template on restore."""

    def f(x):
        if hasattr(x, "size") and x.size == 0:
            # a plain numpy scalar serializes in both single- and
            # multi-host settings (a fresh jax scalar would be host-local
            # and rejected by orbax under jax.distributed)
            return np.zeros((), np.float32)
        return x

    return jax.tree.map(f, state)


def _unstrip_empty(template, restored):
    def f(t, r):
        if hasattr(t, "size") and t.size == 0:
            return t
        return r

    return jax.tree.map(f, template, restored)


def save_checkpoint(path: str | Path, state, force: bool = True) -> None:
    """Save any pytree (e.g. a PPO train carry) to ``path``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _strip_empty(state), force=force)


def restore_checkpoint(path: str | Path, template):
    """Restore a pytree saved by :func:`save_checkpoint`. ``template`` is
    a matching pytree (e.g. from the init_fn) providing structure/shapes/
    shardings — restored arrays adopt the template's sharding, so this
    also restores distributed carries onto a mesh."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target=_strip_empty(template))
    return _unstrip_empty(template, restored)


def restore_raw(path: str | Path):
    """Restore a checkpoint WITHOUT a template, as plain (nested) pytrees
    on the current default device — shapes/dtypes come from the stored
    metadata, and shardings recorded on other hardware (e.g. a TPU
    checkpoint opened on a CPU host) fall back to a local single-device
    placement. Use for inference/evaluation from checkpoints whose carry
    structure predates the current code (fields added/removed since)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.is_dir() and not (path / "_METADATA").exists():
        # manager layout: <dir>/<step>/default — pick the latest step
        steps = sorted(
            int(p.name) for p in path.iterdir() if p.name.isdigit()
        )
        if steps:
            path = path / str(steps[-1]) / "default"
    fallback = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(
            path,
            args=ocp.args.StandardRestore(
                item=None, fallback_sharding=fallback
            ),
        )


class CheckpointManager:
    """Rolling checkpoints for a training loop (keep-N, step-indexed)."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(_strip_empty(state)))

    def restore(self, template, step: int | None = None,
                partial: bool = False):
        """``partial=True`` restores only the leaves present in both the
        template and the checkpoint — forward-compatible restore of old
        checkpoints after pytree fields were added/removed (e.g. loading
        params out of a carry saved by an earlier engine version)."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        stripped = _strip_empty(template)
        if partial:
            args = ocp.args.PyTreeRestore(
                item=stripped,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    stripped
                ),
                partial_restore=True,
            )
        else:
            args = ocp.args.StandardRestore(stripped)
        restored = self._mgr.restore(step, args=args)
        return _unstrip_empty(template, restored)

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
