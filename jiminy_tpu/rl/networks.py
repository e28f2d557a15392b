"""Policy/value networks as plain-pytree MLPs.

Reference: the RLlib tier trains small torch MLP policies
(SURVEY.md §2.5/§3.4). Here networks are hand-rolled parameter pytrees —
no framework state, trivially sharded/replicated under ``shard_map``.
Weights use bf16-safe orthogonal init; compute stays f32 (policies are
tiny; the MXU win would be negligible and f32 keeps PPO stable).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _orthogonal(key, shape, scale):
    a = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(a if shape[0] >= shape[1] else a.T)
    q = q * jnp.sign(jnp.diagonal(r))
    if shape[0] < shape[1]:
        q = q.T
    return scale * q[: shape[0], : shape[1]]


def init_mlp(key, sizes: Sequence[int], out_scale: float = 0.01) -> list:
    """[(W, b), ...] with orthogonal init (PPO standard)."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        scale = out_scale if i == len(sizes) - 2 else float(np.sqrt(2.0))
        W = _orthogonal(k, (sizes[i], sizes[i + 1]), scale)
        params.append((W, jnp.zeros(sizes[i + 1])))
    return params


def mlp_apply(params: list, x: jax.Array) -> jax.Array:
    for i, (W, b) in enumerate(params):
        x = x @ W + b
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


class MLPPolicy:
    """Actor-critic bundle: continuous (diag-Gaussian) or discrete
    (categorical) actor + value head, as pure functions over a params
    pytree ``{"actor": ..., "critic": ..., "log_std": ...?}``."""

    def __init__(
        self,
        obs_size: int,
        action_size: int,
        discrete: bool = False,
        hidden: Sequence[int] = (256, 256),
    ):
        self.obs_size = obs_size
        self.action_size = action_size
        self.discrete = discrete
        self.hidden = tuple(hidden)

    def init(self, key) -> dict:
        k1, k2 = jax.random.split(key)
        params = {
            "actor": init_mlp(
                k1, (self.obs_size, *self.hidden, self.action_size)
            ),
            "critic": init_mlp(k2, (self.obs_size, *self.hidden, 1), 1.0),
        }
        if not self.discrete:
            params["log_std"] = jnp.zeros(self.action_size)
        return params

    def value(self, params, obs) -> jax.Array:
        return mlp_apply(params["critic"], obs)[..., 0]

    def action_dist(self, params, obs):
        """Returns distribution parameters: logits (discrete) or
        (mean, std) (continuous)."""
        out = mlp_apply(params["actor"], obs)
        if self.discrete:
            return out
        return out, jnp.exp(params["log_std"])

    def sample(self, params, obs, key):
        """(action, log_prob)."""
        if self.discrete:
            logits = self.action_dist(params, obs)
            a = jax.random.categorical(key, logits)
            logp = jax.nn.log_softmax(logits)[
                ..., a
            ] if logits.ndim == 1 else jnp.take_along_axis(
                jax.nn.log_softmax(logits), a[..., None], axis=-1
            )[..., 0]
            return a, logp
        mean, std = self.action_dist(params, obs)
        eps = jax.random.normal(key, mean.shape)
        a = mean + std * eps
        logp = self.log_prob(params, obs, a)
        return a, logp

    def log_prob(self, params, obs, action):
        if self.discrete:
            logits = self.action_dist(params, obs)
            logp_all = jax.nn.log_softmax(logits)
            if logits.ndim == 1:
                return logp_all[action]
            return jnp.take_along_axis(
                logp_all, action[..., None], axis=-1
            )[..., 0]
        mean, std = self.action_dist(params, obs)
        z = (action - mean) / std
        return jnp.sum(
            -0.5 * z * z - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
        )

    def entropy(self, params, obs):
        if self.discrete:
            logits = self.action_dist(params, obs)
            p = jax.nn.softmax(logits)
            return -jnp.sum(p * jax.nn.log_softmax(logits), axis=-1)
        _, std = self.action_dist(params, obs)
        return jnp.sum(0.5 * jnp.log(2.0 * jnp.pi * jnp.e) + jnp.log(std))
