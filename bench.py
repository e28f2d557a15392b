"""Benchmark: aggregate env-steps/s on the flagship ANYmal env, one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north star): 1,000,000 env-steps/s on an
ANYmal-class quadruped at batch 4096 on one TPU host; vs_baseline is
value / 1e6.

One env step = one 50 Hz control step = 4 physics substeps at 5 ms
(200 Hz physics, the standard quadruped-RL setting), each a full
PGS-contact dynamics step with the PD inner loop — the engine itself
advances 4× the reported rate.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    import numpy as np

    from jiminy_tpu.envs import ANYmalEnv

    # build the env with ops placed on the HOST cpu device: under the axon
    # TPU plugin every eager op is a tunnel round trip, which turns the
    # (python-side) env construction into minutes; constants transfer to
    # the TPU at jit time anyway
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        env = ANYmalEnv(observe="state", step_dt=0.02, sim_dt=5e-3, pgs_iters=8)
    B = 4096
    T = 25

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            st, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (B, 12), minval=-1.0, maxval=1.0)
            st = jax.vmap(env.step)(st, a)
            return (st, key), None

        (st, _), _ = jax.lax.scan(body, (states, key), None, length=T)
        return st

    # compile + warmup. NOTE: sync via np.asarray (device→host copy) —
    # jax.block_until_ready returns EARLY through the axon TPU tunnel and
    # under-measures by >10×
    out = rollout(states, jax.random.PRNGKey(1))
    np.asarray(out.sim.q[0, 0])
    out = rollout(out, jax.random.PRNGKey(99))  # warm steady-state
    np.asarray(out.sim.q[0, 0])

    t0 = time.perf_counter()
    n_iters = 4
    for i in range(n_iters):
        out = rollout(out, jax.random.PRNGKey(2 + i))
    np.asarray(out.sim.q[0, 0])
    dt = time.perf_counter() - t0

    steps_per_s = B * T * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_anymal_b4096",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
