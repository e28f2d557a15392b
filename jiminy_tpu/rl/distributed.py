"""Multi-chip / multi-host PPO via shard_map over a device mesh.

Reference scale-out: Ray RLlib rollout workers + torch DDP (SURVEY.md
§3.4). TPU-native equivalent (SURVEY.md §2.6): ONE SPMD program — the env
batch is sharded along the mesh ``data`` axis, the learner params are
replicated, and gradients/metrics are reduced with ``pmean`` over ICI/DCN
collectives. Multi-host runs launch the same program under
``jax.distributed.initialize``; nothing else changes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX ≥ 0.5 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jiminy_tpu.rl.ppo import PPOConfig, make_train_fn


def make_distributed_train(env, cfg: PPOConfig, mesh: Mesh, axis: str = "data"):
    """Build (init_fn, train_step) running across ``mesh``.

    carry = (params[replicated], opt_state[replicated],
             env_states[sharded on batch], key[replicated],
             iter_count[replicated]).
    ``cfg.num_envs`` is the GLOBAL batch; must divide by the axis size.
    """
    n_shards = mesh.shape[axis]
    if cfg.num_envs % (n_shards * cfg.minibatches) != 0:
        raise ValueError(
            f"num_envs={cfg.num_envs} must divide by axis size {n_shards} "
            f"× minibatches {cfg.minibatches}"
        )
    init_fn, train_step, policy = make_train_fn(env, cfg, axis=axis)

    carry_specs = (P(), P(), P(axis), P(), P())

    dist_step = jax.jit(
        shard_map(
            train_step,
            mesh=mesh,
            in_specs=(carry_specs,),
            out_specs=(carry_specs, P()),
            check_vma=False,
        )
    )

    def dist_init(key):
        params, opt_state, states, k, it = init_fn(key, cfg.num_envs)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
        states = jax.device_put(states, NamedSharding(mesh, P(axis)))
        k = jax.device_put(k, NamedSharding(mesh, P()))
        it = jax.device_put(it, NamedSharding(mesh, P()))
        return (params, opt_state, states, k, it)

    return dist_init, dist_step, policy
