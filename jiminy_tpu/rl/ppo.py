"""PPO — anakin-style: rollout and learning fused in one XLA program.

Reference: the ``gym_jiminy.rllib`` tier trains PPO with Ray workers
collecting sample batches over gRPC and a torch learner (SURVEY.md §2.5,
§3.4). TPU-native redesign (SURVEY.md §2.6): the env batch lives on
device, rollout (lax.scan over env.step) and the clipped-surrogate update
run inside ONE jitted ``train_step``; scale-out is ``shard_map`` over a
``data`` mesh axis with ``pmean`` gradient reduction riding ICI — no
parameter server, no RPC in the hot path.

Truncation handling: envs auto-reset on done, but expose the pre-reset
terminal observation (``info["final_obs"]``), so the TD target bootstraps
V(terminal) on truncation and zero on true termination — the masked-
bootstrapping pattern flagged in SURVEY.md §7 (variable-length episodes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from jiminy_tpu.rl.networks import MLPPolicy


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 2048  # global batch (split across mesh shards)
    rollout_len: int = 16
    epochs: int = 4
    minibatches: int = 8
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    hidden: tuple = (256, 256)
    anneal_lr: bool = False
    # linearly anneal the entropy bonus to 0 over total_iters. Without
    # it the Gaussian policy keeps a large σ to collect the bonus and
    # the gait can come to RELY on action dither: the round-3 Cassie
    # push artifact evaluated 29-33% falls with the deterministic MEAN
    # policy while the stochastic one fell 0% (diagnosed round 4).
    # Annealing sharpens the mean into the deployable artifact.
    anneal_ent: bool = False
    total_iters: int = 1000  # only used for lr/ent annealing
    # reference rllib-tier extras (SURVEY.md §2.5: "L2 regularization and
    # symmetry-augmented surrogate options upstream")
    l2_reg: float = 0.0  # weight decay on network weights
    symmetry_coef: float = 0.0  # weight of the mirror-symmetry loss


def _gae(traj, gamma, lam):
    """Generalized advantage estimation over a (T, B) trajectory dict."""
    not_term = 1.0 - traj["terminated"].astype(jnp.float32)
    not_done = 1.0 - traj["done"].astype(jnp.float32)
    delta = (
        traj["reward"] + gamma * not_term * traj["final_value"] - traj["value"]
    )

    def back(carry, x):
        d, nd = x
        adv = d + gamma * lam * nd * carry
        return adv, adv

    _, adv = jax.lax.scan(
        back,
        jnp.zeros_like(delta[0]),
        (delta, not_done),
        reverse=True,
    )
    return adv, adv + traj["value"]


def make_train_fn(
    env,
    cfg: PPOConfig,
    axis: str | None = None,
    symmetry_fn: Callable | None = None,
) -> tuple[Callable, Callable, MLPPolicy]:
    """Build (init_fn, train_step) for one mesh shard.

    ``axis``: mesh axis name for gradient/metric pmean (None = single
    device; the caller wraps train_step in shard_map when distributed).
    ``symmetry_fn(obs, action) → (obs_mirrored, action_mirrored)``: the
    robot's mirror transform; with ``cfg.symmetry_coef > 0`` the loss adds
    ‖π(mirror(obs)) − mirror(π(obs))‖² (the reference fork's
    symmetry-augmented surrogate for locomotion gaits).
    init_fn(key, n_envs) → carry; train_step(carry) → (carry, metrics).
    carry = (params, opt_state, env_states, key).
    """
    discrete = env.discrete_actions is not None
    act_size = env.discrete_actions if discrete else env.action_size
    obs_size = env.observation_size
    policy = MLPPolicy(obs_size, act_size, discrete=discrete, hidden=cfg.hidden)

    if cfg.anneal_lr:
        # optax counts one step per MINIBATCH update, not per iteration
        total_updates = cfg.total_iters * cfg.epochs * cfg.minibatches
        schedule = optax.linear_schedule(cfg.lr, 0.0, total_updates)
    else:
        schedule = cfg.lr
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(schedule, eps=1e-5),
    )

    def init_fn(key, n_envs: int):
        k_params, k_envs, k_run = jax.random.split(key, 3)
        params = policy.init(k_params)
        opt_state = tx.init(params)
        states = jax.vmap(env.reset)(jax.random.split(k_envs, n_envs))
        return (params, opt_state, states, k_run, jnp.int32(0))

    def rollout(params, states, key):
        def step_fn(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            a, logp = policy.sample(params, states.obs, k_act)
            value = policy.value(params, states.obs)
            obs = states.obs
            states = jax.vmap(env.step)(states, a)
            final_value = policy.value(params, states.info["final_obs"])
            tr = {
                "obs": obs,
                "action": a,
                "logp": logp,
                "value": value,
                "reward": states.reward,
                "terminated": states.terminated,
                "done": states.done,
                "final_value": final_value,
            }
            return (states, key), tr

        (states, key), traj = jax.lax.scan(
            step_fn, (states, key), None, length=cfg.rollout_len
        )
        return states, traj

    def loss_fn(params, batch, ent_coef):
        logp = policy.log_prob(params, batch["obs"], batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v = policy.value(params, batch["obs"])
        v_clip = batch["value"] + jnp.clip(
            v - batch["value"], -cfg.clip_eps, cfg.clip_eps
        )
        v_loss = 0.5 * jnp.mean(
            jnp.maximum(
                jnp.square(v - batch["ret"]), jnp.square(v_clip - batch["ret"])
            )
        )
        ent = jnp.mean(policy.entropy(params, batch["obs"]))
        total = pg_loss + cfg.vf_coef * v_loss - ent_coef * ent
        if cfg.l2_reg > 0.0:
            l2 = sum(
                jnp.sum(jnp.square(W))
                for net in ("actor", "critic")
                for W, _b in params[net]
            )
            total = total + cfg.l2_reg * l2
        if cfg.symmetry_coef > 0.0 and symmetry_fn is not None:
            if discrete:
                raise ValueError("symmetry loss requires continuous actions")
            mean, _ = policy.action_dist(params, batch["obs"])
            obs_m, act_m = symmetry_fn(batch["obs"], mean)
            mean_m, _ = policy.action_dist(params, obs_m)
            total = total + cfg.symmetry_coef * jnp.mean(
                jnp.square(mean_m - act_m)
            )
        return total, {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": ent,
            "approx_kl": jnp.mean(batch["logp"] - logp),
        }

    def train_step(carry):
        params, opt_state, states, key, it = carry
        if cfg.anneal_ent:
            frac = 1.0 - jnp.minimum(
                it.astype(jnp.float32) / cfg.total_iters, 1.0
            )
            ent_coef = cfg.ent_coef * frac
        else:
            ent_coef = jnp.float32(cfg.ent_coef)
        key, k_roll, k_perm = jax.random.split(key, 3)
        if axis is not None:
            # per-shard stochasticity; the carried key itself stays
            # replicated (grads are pmean'd, so params remain in sync)
            idx = jax.lax.axis_index(axis)
            k_roll = jax.random.fold_in(k_roll, idx)
            k_perm = jax.random.fold_in(k_perm, idx)
        states, traj = rollout(params, states, k_roll)
        adv, ret = _gae(traj, cfg.gamma, cfg.lam)
        n = cfg.rollout_len * traj["reward"].shape[1]
        flat = {
            "obs": traj["obs"].reshape(n, -1),
            "action": traj["action"].reshape(
                (n,) if traj["action"].ndim == 2 else (n, -1)
            ),
            "logp": traj["logp"].reshape(n),
            "value": traj["value"].reshape(n),
            "adv": adv.reshape(n),
            "ret": ret.reshape(n),
        }

        # minibatch shuffle: all fields are packed into ONE matrix and
        # permuted with a SINGLE gather, then split by static slices —
        # several gathers sharing one index vector are miscompiled by the
        # current TPU backend (see engine/solver.py), which silently froze
        # training (zero gradients) when each field was gathered separately
        field_names = sorted(flat)
        widths = [
            flat[name].shape[1] if flat[name].ndim == 2 else 1
            for name in field_names
        ]
        packed = jnp.concatenate(
            [
                (
                    flat[name] if flat[name].ndim == 2 else flat[name][:, None]
                ).astype(jnp.float32)
                for name in field_names
            ],
            axis=1,
        )

        def unpack(mat):
            out, c = {}, 0
            for name, w in zip(field_names, widths):
                col = mat[..., c : c + w].astype(flat[name].dtype)
                out[name] = col if flat[name].ndim == 2 else col[..., 0]
                c += w
            return out

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)
            shuffled = packed[perm]
            mb = unpack(
                shuffled.reshape(
                    cfg.minibatches, n // cfg.minibatches, shuffled.shape[1]
                )
            )

            def mb_update(carry, batch):
                params, opt_state = carry
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    params, batch, ent_coef
                )
                if axis is not None:
                    grads = jax.lax.pmean(grads, axis)
                    aux = jax.lax.pmean(aux, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(
                mb_update, (params, opt_state), mb
            )
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(
            epoch,
            (params, opt_state),
            jax.random.split(k_perm, cfg.epochs),
        )
        metrics = {
            "reward_mean": jnp.mean(traj["reward"]),
            "episode_done_frac": jnp.mean(traj["done"].astype(jnp.float32)),
            **jax.tree.map(lambda x: x[-1, -1], aux),
        }
        if axis is not None:
            metrics = jax.lax.pmean(metrics, axis)
        return (params, opt_state, states, key, it + 1), metrics

    return init_fn, train_step, policy


def train(
    env,
    cfg: PPOConfig | None = None,
    key=None,
    num_iters: int = 50,
    log_every: int = 0,
):
    """Single-host convenience trainer. Returns (params, policy, metrics
    history). For multi-chip, wrap make_train_fn's train_step in shard_map
    (see __graft_entry__.dryrun_multichip and rl/distributed.py)."""
    cfg = cfg or PPOConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    init_fn, train_step, policy = make_train_fn(env, cfg)
    carry = init_fn(key, cfg.num_envs)
    step = jax.jit(train_step)
    history = []
    for i in range(num_iters):
        carry, metrics = step(carry)
        if log_every and (i % log_every == 0):
            m = {k: float(v) for k, v in metrics.items()}
            print(f"iter {i}: {m}")
        history.append(metrics)
    params = carry[0]
    history = jax.tree.map(lambda *xs: jnp.stack(xs), *history)
    return params, policy, history
