"""Multi-host (N-process) tests on a CPU ring — the framework's own
distributed test story (SURVEY.md §4: "N-process jax.distributed tests on
CPU rings — no TPU needed for correctness CI")."""

import pytest

from jiminy_tpu.rl.launch import launch_cpu_ring


@pytest.mark.slow
class TestCpuRing:
    def test_psum_across_processes(self):
        outs = launch_cpu_ring(
            2,
            """
            import jax, jax.numpy as jnp
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            from jax import shard_map
            mesh = Mesh(jax.devices(), ("data",))
            assert jax.device_count() == 4
            @jax.jit
            def f(x):
                return shard_map(lambda x: jax.lax.psum(x, "data"),
                                 mesh=mesh, in_specs=P("data"),
                                 out_specs=P())(x)
            x = jax.device_put(jnp.arange(4.0),
                               NamedSharding(mesh, P("data")))
            print("PSUM", float(f(x)[0]))
            """,
            local_devices=2,
        )
        for out in outs:
            assert "PSUM 6.0" in out

    def test_distributed_ppo_across_processes(self):
        """Full PPO train step over a 2-process global mesh; both hosts
        must report the identical (pmean'd) metric."""
        outs = launch_cpu_ring(
            2,
            """
            import jax
            from jiminy_tpu.envs import CartPoleEnv
            from jiminy_tpu.rl import PPOConfig
            from jiminy_tpu.rl.distributed import make_distributed_train
            from jiminy_tpu.rl.launch import global_mesh
            mesh = global_mesh()
            cfg = PPOConfig(num_envs=32, rollout_len=4, minibatches=2,
                            epochs=1, hidden=(16, 16))
            init_fn, step, _ = make_distributed_train(
                CartPoleEnv(), cfg, mesh)
            carry = init_fn(jax.random.PRNGKey(0))
            carry, metrics = step(carry)
            print("REWARD %.6f" % float(metrics["reward_mean"]))
            """,
            local_devices=2,
        )
        rewards = set()
        for out in outs:
            line = [l for l in out.splitlines() if l.startswith("REWARD")][-1]
            rewards.add(line)
        assert len(rewards) == 1  # identical across hosts
