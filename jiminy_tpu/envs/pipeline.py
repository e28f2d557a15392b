"""Pipeline framework: composable observer/controller env layers.

Reference: gym_jiminy's pipeline — observer/controller *blocks* layered
as env wrappers (ObservedJiminyEnv / ControlledJiminyEnv), observation
stacking/normalization wrappers, and a declarative ``build_pipeline``
(SURVEY.md §2.4 "Pipeline framework", "Wrappers & utils").

TPU redesign: every layer is a pure (reset, step) pair over a state
pytree that embeds the inner env's state plus the layer's own (block
states, FIFOs, running statistics). The whole stack compiles into one
XLA step; ``info["final_obs"]`` is threaded through every layer so PPO's
truncation bootstrapping keeps working at any pipeline depth.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.envs.base import BaseEnv, EnvState


class WrapperState(struct.PyTreeNode):
    """State of one pipeline layer: the wrapped env's state + this
    layer's own state; mirrors EnvState's learner-facing fields."""

    inner: Any
    layer: Any
    obs: jax.Array
    info: dict = struct.field(default_factory=dict)

    # learner-facing passthrough
    @property
    def reward(self):
        return self.inner.reward

    @property
    def terminated(self):
        return self.inner.terminated

    @property
    def truncated(self):
        return self.inner.truncated

    @property
    def done(self):
        return self.inner.done

    @property
    def steps(self):
        return self.inner.steps

    @property
    def sim(self):
        return self.inner.sim

    @property
    def rng(self):
        # recurses through nested wrappers down to EnvState.rng —
        # without it, stacking two layers (e.g. mahony + stack) broke
        # at the auto-reset layer re-init (round-5 Cassie run)
        return self.inner.rng


class EnvWrapper:
    """Identity wrapper; subclasses override hooks. Presents the BaseEnv
    functional interface (reset/step/sizes)."""

    def __init__(self, env):
        self.env = env

    # ---- metadata passthrough -----------------------------------------
    @property
    def action_size(self):
        return self.env.action_size

    @property
    def discrete_actions(self):
        return self.env.discrete_actions

    @property
    def observation_size(self) -> int:
        return int(self.reset(jax.random.PRNGKey(0)).obs.shape[-1])

    @property
    def unwrapped(self):
        e = self.env
        return e.unwrapped if isinstance(e, EnvWrapper) else e

    # ---- hooks -----------------------------------------------------------
    def _init_layer(self, key, inner_state):
        return ()

    def _transform_action(self, layer, action, inner_state):
        """→ (layer', inner_action)."""
        return layer, action

    def _transform_obs(self, layer, obs, inner_state):
        """→ (layer', wrapped_obs). Must be pure & reusable for final_obs."""
        return layer, obs

    # ---- machinery -------------------------------------------------------
    def reset(self, key) -> WrapperState:
        inner = self.env.reset(key)
        layer = self._init_layer(key, inner)
        layer, obs = self._transform_obs(layer, inner.obs, inner)
        info = dict(inner.info)
        info["final_obs"] = obs
        return WrapperState(inner=inner, layer=layer, obs=obs, info=info)

    def step(self, state: WrapperState, action) -> WrapperState:
        layer, inner_action = self._transform_action(
            state.layer, action, state.inner
        )
        inner = self.env.step(state.inner, inner_action)
        # wrapped view of the terminal (pre-reset) observation; does not
        # advance the layer state (its output layer is discarded). Layers
        # that read sensor buffers (mahony) must see the PRE-reset ones —
        # after auto-reset info["sensor_bufs"] is the next episode's
        # (ADVICE r4: terminal-bootstrap attitude consistency)
        inner_final = inner
        if "final_sensor_bufs" in inner.info:
            inner_final = inner.replace(
                info={
                    **inner.info,
                    "sensor_bufs": inner.info["final_sensor_bufs"],
                }
            )
        _, final_obs = self._transform_obs(
            layer, inner.info["final_obs"], inner_final
        )
        # on done, the layer state resets alongside the env; else continue
        fresh = self._init_layer(state.inner.rng, inner)
        done = inner.done

        def pick(a, b):
            return jnp.where(
                jnp.reshape(done, (1,) * jnp.ndim(a)) if jnp.ndim(a) else done,
                a,
                b,
            )

        base = jax.tree.map(pick, fresh, layer)
        layer_next, obs = self._transform_obs(base, inner.obs, inner)
        info = dict(inner.info)
        info["final_obs"] = final_obs
        return WrapperState(inner=inner, layer=layer_next, obs=obs, info=info)

    def step_no_reset(self, state: WrapperState, action) -> WrapperState:
        layer, inner_action = self._transform_action(
            state.layer, action, state.inner
        )
        inner = self.env.step_no_reset(state.inner, inner_action)
        layer, obs = self._transform_obs(layer, inner.obs, inner)
        info = dict(inner.info)
        info["final_obs"] = obs
        return WrapperState(inner=inner, layer=layer, obs=obs, info=info)


class ControlledEnv(EnvWrapper):
    """Controller block layer: policy action → block → inner action
    (reference: ControlledJiminyEnv). ``inputs_fn(inner_state) → dict``
    extracts the block's feedback inputs (default: motor joint state)."""

    def __init__(self, env, block, inputs_fn: Callable | None = None,
                 action_size: int | None = None):
        super().__init__(env)
        self.block = block
        self._action_size = action_size
        self.inputs_fn = inputs_fn

    @property
    def action_size(self):
        return self._action_size or self.env.action_size

    def _init_layer(self, key, inner_state):
        q0 = inner_state.sim.q
        try:
            return self.block.init(key, q0=q0)
        except TypeError:
            return self.block.init(key)

    def _transform_action(self, layer, action, inner_state):
        if self.inputs_fn is not None:
            inputs = self.inputs_fn(inner_state)
        else:
            inputs = {}
        return self.block.apply(layer, action, **inputs)


class ObservedEnv(EnvWrapper):
    """Observer block layer: augments the observation with a block output
    (reference: ObservedJiminyEnv). ``inputs_fn(inner_state) → dict``
    feeds the block; the output is concatenated to the inner obs."""

    def __init__(self, env, block, inputs_fn: Callable):
        super().__init__(env)
        self.block = block
        self.inputs_fn = inputs_fn

    def _init_layer(self, key, inner_state):
        return self.block.init(key)

    def _transform_obs(self, layer, obs, inner_state):
        layer, out = self.block.apply(layer, **self.inputs_fn(inner_state))
        return layer, jnp.concatenate([obs, jnp.ravel(out)])


class StackedObsEnv(EnvWrapper):
    """Fixed-FIFO observation stacking (reference: stacking wrapper).
    Obs = concat of the last ``n`` inner observations (zero-padded)."""

    def __init__(self, env, n: int):
        super().__init__(env)
        self.n = n

    def _init_layer(self, key, inner_state):
        d = inner_state.obs.shape[-1]
        return jnp.zeros((self.n - 1, d))

    def _transform_obs(self, layer, obs, inner_state):
        stacked = jnp.concatenate([obs[None], layer], axis=0)
        return stacked[: self.n - 1], jnp.ravel(stacked)


class NormalizedObsEnv(EnvWrapper):
    """Running mean/std observation normalization (reference:
    normalization wrapper). Statistics live in the layer state; freeze
    them at evaluation by setting ``update=False``."""

    def __init__(self, env, clip: float = 10.0, update: bool = True,
                 eps: float = 1e-6, stats: dict | None = None):
        super().__init__(env)
        self.clip = clip
        self.update = update
        self.eps = eps
        # frozen statistics for evaluation: fresh resets start from the
        # TRAINING-TIME mean/var instead of cold unit stats (reference:
        # VecNormalize-style eval mode; see freeze_pipeline_stats)
        self.stats = stats

    def _init_layer(self, key, inner_state):
        d = inner_state.obs.shape[-1]
        if self.stats is not None:
            return {
                "mean": jnp.asarray(self.stats["mean"], jnp.float32),
                "var": jnp.asarray(self.stats["var"], jnp.float32),
                "count": jnp.float32(self.stats.get("count", 1.0)),
            }
        return {
            "mean": jnp.zeros(d),
            "var": jnp.ones(d),
            "count": jnp.float32(self.eps),
        }

    def step(self, state, action):  # stats must persist across auto-reset
        layer = state.layer
        inner = self.env.step(state.inner, action)
        if self.update:
            x = inner.obs
            count = layer["count"] + 1.0
            delta = x - layer["mean"]
            mean = layer["mean"] + delta / count
            var = layer["var"] + (delta * (x - mean) - layer["var"]) / count
            layer = {"mean": mean, "var": var, "count": count}
        _, obs = self._transform_obs(layer, inner.obs, inner)
        _, final_obs = self._transform_obs(layer, inner.info["final_obs"], inner)
        info = dict(inner.info)
        info["final_obs"] = final_obs
        return WrapperState(inner=inner, layer=layer, obs=obs, info=info)

    def _transform_obs(self, layer, obs, inner_state):
        z = (obs - layer["mean"]) / jnp.sqrt(layer["var"] + self.eps)
        return layer, jnp.clip(z, -self.clip, self.clip)


def mahony_layer(env, kp: float = 1.0, ki: float = 0.1):
    """Observer layer dogfooding :class:`~jiminy_tpu.envs.blocks.
    MahonyFilter`: reads (gyro, accel) from the base env's IMU sensor
    stream each step and appends the filtered attitude quaternion (4,)
    to the observation (reference: the MahonyFilter observer block in a
    gym_jiminy pipeline, SURVEY.md §2.4 "Blocks"). Requires a
    sensor-driven env (``observe="sensors"``) so the filter sees the
    same delayed/noisy measurements the policy does."""
    from jiminy_tpu.envs.blocks import MahonyFilter

    base = env
    while isinstance(base, EnvWrapper):
        base = base.env
    suite = getattr(base, "sensors", None)
    if suite is None or not any(g.type == "imu" for g in suite.groups):
        raise ValueError(
            "mahony layer requires an env with an IMU sensor suite "
            "(walker envs: observe='sensors')"
        )
    block = MahonyFilter(dt=base.step_dt, kp=kp, ki=ki)

    def inputs_fn(inner_state):
        imu = suite.read(inner_state.info["sensor_bufs"])["imu"][0]
        return {"gyro": imu[4:7], "accel": imu[7:10]}

    return ObservedEnv(env, block, inputs_fn)


_WRAPPERS = {
    "controller": ControlledEnv,
    "observer": ObservedEnv,
    "stack": StackedObsEnv,
    "normalize": NormalizedObsEnv,
    "mahony": mahony_layer,
}


def build_pipeline(env, layers: list[dict]):
    """Declarative pipeline assembly (reference: ``build_pipeline`` from a
    config dict/TOML). Each layer: {"type": one of controller/observer/
    stack/normalize, **kwargs}."""
    for spec in layers:
        spec = dict(spec)
        kind = spec.pop("type")
        env = _WRAPPERS[kind](env, **spec)
    return env


def freeze_pipeline_stats(env, states):
    """Evaluation twin of a trained pipeline env: every NormalizedObsEnv
    layer is rebuilt FROZEN at the batch-averaged running statistics
    found in ``states`` (the final training-time env states), so fresh
    eval resets normalize exactly like training did instead of starting
    from cold unit stats (reference: VecNormalize-style eval mode —
    observation statistics are part of the trained artifact). Other
    layers are reused as-is; the base env is shared.

    ``states`` may be live WrapperState pytrees OR the raw nested dicts
    a template-free ``checkpoint.restore_raw`` returns (so evaluate-only
    tools can freeze stats straight from a saved carry)."""
    import copy

    def get(s, k):
        return s[k] if isinstance(s, dict) else getattr(s, k)

    if not isinstance(env, EnvWrapper):
        return env
    inner = freeze_pipeline_stats(env.env, get(states, "inner"))
    if isinstance(env, NormalizedObsEnv):
        layer = get(states, "layer")
        return NormalizedObsEnv(
            inner, clip=env.clip, update=False, eps=env.eps,
            stats={
                "mean": jnp.mean(jnp.asarray(layer["mean"]), axis=0),
                "var": jnp.mean(jnp.asarray(layer["var"]), axis=0),
            },
        )
    new = copy.copy(env)
    new.env = inner
    return new
