"""Checkpoint/resume: exact pytree round-trip and resume determinism
(SURVEY.md §5: whole training state via Orbax; recovery unit)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from jiminy_tpu.envs import CartPoleEnv
from jiminy_tpu.rl import PPOConfig
from jiminy_tpu.rl.ppo import make_train_fn


def _carry():
    env = CartPoleEnv()
    cfg = PPOConfig(
        num_envs=16, rollout_len=4, minibatches=2, epochs=1, hidden=(16, 16)
    )
    init_fn, train_step, _ = make_train_fn(env, cfg)
    carry = init_fn(jax.random.PRNGKey(0), 16)
    carry, _ = jax.jit(train_step)(carry)
    return carry, init_fn, train_step


class TestCheckpoint:
    def test_roundtrip_exact_and_resume_deterministic(self, tmp_path):
        carry, init_fn, train_step = _carry()
        save_checkpoint(tmp_path / "ck", carry)
        template = init_fn(jax.random.PRNGKey(1), 16)
        restored = restore_checkpoint(tmp_path / "ck", template)
        for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training resumed from the restore is bit-identical
        c1, _ = jax.jit(train_step)(carry)
        c2, _ = jax.jit(train_step)(restored)
        np.testing.assert_array_equal(
            np.asarray(c1[0]["actor"][0][0]), np.asarray(c2[0]["actor"][0][0])
        )

    def test_manager_rolls_and_restores(self, tmp_path):
        carry, init_fn, _ = _carry()
        mgr = CheckpointManager(tmp_path / "run", max_to_keep=2)
        for s in range(4):
            mgr.save(s, carry)
        mgr.close()
        mgr = CheckpointManager(tmp_path / "run")
        assert mgr.latest_step == 3
        # only the last two kept
        kept = sorted(
            int(p) for p in os.listdir(tmp_path / "run") if p.isdigit()
        )
        assert kept == [2, 3]
        template = init_fn(jax.random.PRNGKey(2), 16)
        r = mgr.restore(template)
        np.testing.assert_array_equal(
            np.asarray(r[0]["actor"][0][0]), np.asarray(carry[0]["actor"][0][0])
        )
        mgr.close()

    def test_sim_state_checkpoint(self, tmp_path):
        """Plain simulation state (t, q, v) capture & exact resume —
        the reference's start-from-logged-state workflow."""
        from jiminy_tpu.engine.engine import Engine, EngineOptions
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_pendulum

        eng = Engine(
            make_pendulum(),
            EngineOptions(dt=1e-3),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        st = eng.reset(q=jnp.array([0.9]))
        step = jax.jit(lambda s: eng.step(s, jnp.zeros(1), n_substeps=100))
        st = step(st)
        save_checkpoint(tmp_path / "sim", st)
        back = restore_checkpoint(tmp_path / "sim", eng.reset())
        cont_a = step(st)
        cont_b = step(back)
        np.testing.assert_array_equal(np.asarray(cont_a.q), np.asarray(cont_b.q))


class TestForwardCompatRestore:
    def test_restore_raw_without_template(self, tmp_path):
        """Checkpoints restore as raw pytrees with no template — the
        escape hatch for loading carries whose structure predates the
        current code (e.g. params from an old training run)."""
        import jax.numpy as jnp

        from jiminy_tpu.checkpoint import CheckpointManager, restore_raw

        carry = (
            {"w": jnp.arange(6.0).reshape(2, 3)},
            (jnp.float32(3.0),),
        )
        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save(7, carry)
        mgr.close()
        raw = restore_raw(tmp_path / "ck")  # finds latest step itself
        w = raw[0]["w"] if isinstance(raw, (list, tuple)) else raw["0"]["w"]
        np.testing.assert_allclose(np.asarray(w), carry[0]["w"])
