"""Where does the env step's fixed overhead go? (VERDICT r4 next #3)

ROOFLINE.json showed the B=4096 bench is latency/launch-bound: from the
B=4096 (6.5M steps/s) and B=16384 (9.8M) points, cost(B) = a + b·B with
a ≈ 280 µs fixed per step — ~45% of the step. The physics kernel is ONE
fused launch; the residual is the XLA op cloud around it (obs, reward,
termination, nan guard, auto-reset, action sampling). This tool times
the bench rollout with pieces removed, on the bench's own methodology
(jitted T-step scan, np.asarray sync — block_until_ready returns early
through the axon tunnel).

Usage: python benchmarks/envstep_breakdown.py [batch]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def rollout_rate(env, states, step_fn, B, T=25, n_iters=4, act_fn=None):
    """env-steps/s of a jitted scan of ``step_fn`` (bench.py method)."""

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            st, key = carry
            key, k = jax.random.split(key)
            if act_fn is None:
                a = jax.random.uniform(
                    k, (B, env.action_size), minval=-1.0, maxval=1.0
                )
            else:
                a = act_fn(k)
            st = step_fn(st, a)
            return (st, key), None

        (st, _), _ = jax.lax.scan(body, (states, key), None, length=T)
        return st

    out = rollout(states, jax.random.PRNGKey(1))
    np.asarray(jax.tree.leaves(out)[0])
    out = rollout(out, jax.random.PRNGKey(99))
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = rollout(out, jax.random.PRNGKey(2 + i))
    np.asarray(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    return B * T * n_iters / dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from jiminy_tpu.envs import ANYmalEnv

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        env = ANYmalEnv(observe="state", step_dt=0.02, sim_dt=5e-3, pgs_iters=8)
        env_nl = ANYmalEnv(observe="state", 
            step_dt=0.02, sim_dt=5e-3, pgs_iters=8, nan_guard=False
        )
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)

    rows = []

    def add(name, rate):
        rows.append((name, rate))
        us = B / rate * 1e6
        print(f"{name:34s} {rate / 1e6:7.2f} M steps/s   "
              f"{us:7.1f} us/scan-step", flush=True)

    add("full step (bench)", rollout_rate(
        env, states, jax.vmap(env.step), B))
    add("no nan_guard", rollout_rate(
        env_nl, states, jax.vmap(env_nl.step), B))
    add("step_no_reset", rollout_rate(
        env, states, jax.vmap(env.step_no_reset), B))
    add("no_reset + no nan_guard", rollout_rate(
        env_nl, states, jax.vmap(env_nl.step_no_reset), B))
    add("zero actions (no RNG sample)", rollout_rate(
        env, states, jax.vmap(env.step), B,
        act_fn=lambda k: jnp.zeros((B, env.action_size))))

    # engine only: the fused physics kernel + nothing else
    eng = env.engine
    sims = states.sim

    def sim_step(sims, a):
        u = jax.vmap(env._action_to_command)(a, sims)
        return jax.vmap(
            lambda s, uu: eng.step(s, uu, n_substeps=env.n_substeps)
        )(sims, u)

    add("engine.step only", rollout_rate(env, sims, sim_step, B))

    full = rows[0][1]
    sim_only = rows[-1][1]
    print(f"\nenv-layer overhead: "
          f"{B / full * 1e6 - B / sim_only * 1e6:6.1f} us/step "
          f"({1 - full / sim_only:+.1%} of throughput)")

    # ---- sensor path (VERDICT r4 #4): fused in-kernel stage vs the
    # chunked fallback (n_obs_updates launches + XLA measurement cloud)
    with jax.default_device(cpu):
        env_s = ANYmalEnv(
            observe="sensors", step_dt=0.02, sim_dt=5e-3, pgs_iters=8,
            sensor_delay=5e-3, imu_noise=0.02, encoder_noise=0.005,
        )
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states_s = jax.jit(jax.vmap(env_s.reset))(keys)
    if env_s._fused_sensors:
        add("sensors, fused in-kernel stage", rollout_rate(
            env_s, states_s, jax.vmap(env_s.step), B))
        env_s._fused_sensors = False
    add("sensors, chunked fallback", rollout_rate(
        env_s, states_s, jax.vmap(env_s.step), B))


if __name__ == "__main__":
    main()
