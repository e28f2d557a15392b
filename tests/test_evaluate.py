"""evaluate/play utilities (reference BaseJiminyEnv evaluate & play)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.envs import CartPoleEnv
from jiminy_tpu.rl.evaluate import evaluate, play


class TestEvaluate:
    def test_stats_shape_and_sanity(self):
        env = CartPoleEnv()

        def policy(obs):  # push toward the pole's lean: decent heuristic
            return (obs[..., 2] > 0).astype(jnp.int32)

        stats = evaluate(env, policy, n_envs=32, n_steps=100)
        assert 0.0 <= stats["fall_fraction"] <= 1.0
        assert 1.0 <= stats["length_mean"] <= 100.0
        assert stats["return_mean"] > 10.0  # heuristic survives a while

    def test_random_policy_worse_than_heuristic(self):
        env = CartPoleEnv()

        def heuristic(obs):
            return (obs[..., 2] > 0).astype(jnp.int32)

        def constant(obs):
            return jnp.ones(obs.shape[:-1], jnp.int32)

        s_h = evaluate(env, heuristic, n_envs=32, n_steps=100)
        s_c = evaluate(env, constant, n_envs=32, n_steps=100)
        assert s_h["length_mean"] > s_c["length_mean"]


class TestPlay:
    def test_records_and_replays(self, tmp_path):
        env = CartPoleEnv()
        qs, rewards = play(
            env, None, n_steps=50, replay_path=tmp_path / "r.html"
        )
        assert qs.shape[1] == env.tree.nq
        assert len(rewards) >= 1
        assert (tmp_path / "r.html").stat().st_size > 1000
