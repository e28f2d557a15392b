"""PPO learner tests: GAE math, learning on CartPole, distributed
synchronization on the 8-device virtual mesh (SURVEY.md §4: fake-mesh
collective tests)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from jiminy_tpu.envs import CartPoleEnv
from jiminy_tpu.rl import PPOConfig, train
from jiminy_tpu.rl.distributed import make_distributed_train
from jiminy_tpu.rl.ppo import _gae, make_train_fn


class TestGAE:
    def test_matches_hand_rolled(self):
        T, B = 4, 1
        traj = {
            "reward": jnp.ones((T, B)),
            "terminated": jnp.zeros((T, B), bool),
            "done": jnp.zeros((T, B), bool),
            "value": jnp.zeros((T, B)),
            "final_value": jnp.full((T, B), 2.0),
        }
        gamma, lam = 0.9, 0.8
        adv, ret = _gae(traj, gamma, lam)
        # hand-rolled backward recursion
        delta = 1.0 + gamma * 2.0 - 0.0
        expect = []
        acc = 0.0
        for _ in range(T):
            acc = delta + gamma * lam * acc
            expect.append(acc)
        expect = expect[::-1]
        np.testing.assert_allclose(np.asarray(adv[:, 0]), expect, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ret), np.asarray(adv), rtol=1e-6)

    def test_termination_cuts_bootstrap(self):
        T, B = 2, 1
        traj = {
            "reward": jnp.ones((T, B)),
            "terminated": jnp.array([[True], [False]]),
            "done": jnp.array([[True], [False]]),
            "value": jnp.zeros((T, B)),
            "final_value": jnp.full((T, B), 5.0),
        }
        adv, _ = _gae(traj, 0.9, 0.8)
        # t=0 terminated: no bootstrap, no propagation from t=1
        assert float(adv[0, 0]) == 1.0
        # t=1 alive: bootstraps final_value
        assert abs(float(adv[1, 0]) - (1.0 + 0.9 * 5.0)) < 1e-6

    def test_truncation_bootstraps_terminal_value(self):
        T, B = 1, 1
        traj = {
            "reward": jnp.zeros((T, B)),
            "terminated": jnp.zeros((T, B), bool),
            "done": jnp.ones((T, B), bool),  # truncated
            "value": jnp.zeros((T, B)),
            "final_value": jnp.full((T, B), 3.0),
        }
        adv, _ = _gae(traj, 0.5, 0.9)
        assert abs(float(adv[0, 0]) - 1.5) < 1e-6  # γ·V(final_obs)


class TestPPOLearning:
    def test_cartpole_improves(self):
        env = CartPoleEnv()
        cfg = PPOConfig(
            num_envs=256, rollout_len=32, minibatches=4, epochs=4,
            hidden=(64, 64),
        )
        params, policy, hist = train(env, cfg, num_iters=30)
        done = np.asarray(hist["episode_done_frac"])
        # failure rate collapses (episodes last much longer)
        assert done[-5:].mean() < 0.5 * max(done[:5].mean(), 1e-3)
        for leaf in jax.tree.leaves(params):
            assert bool(jnp.all(jnp.isfinite(leaf)))


class TestDistributed:
    def test_params_stay_synchronized(self):
        env = CartPoleEnv()
        cfg = PPOConfig(
            num_envs=64, rollout_len=4, minibatches=2, epochs=1,
            hidden=(16, 16),
        )
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        init_fn, step, policy = make_distributed_train(env, cfg, mesh)
        carry = init_fn(jax.random.PRNGKey(0))
        for _ in range(2):
            carry, metrics = step(carry)
        params = carry[0]
        W = params["actor"][0][0]
        # replicated param: every device shard identical
        shards = [np.asarray(s.data) for s in W.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
        assert np.isfinite(float(metrics["reward_mean"]))

    def test_matches_shard_count_requirements(self):
        env = CartPoleEnv()
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        import pytest

        with pytest.raises(ValueError):
            make_distributed_train(
                env, PPOConfig(num_envs=17), mesh
            )
