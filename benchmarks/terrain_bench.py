"""Rough-terrain rollout throughput: per-env analytic terrains
(Fourier/Perlin/stairs) on the whole-substep kernel vs the shared grid
Perlin heightmap on the chain kernel.

VERDICT r1 #4 target: the analytic-Perlin/substep path ≥3× the
chain-kernel grid-heightmap number, so terrain-randomized training (SURVEY.md §2.4 random
ground) rides the fast path.

Usage: python benchmarks/terrain_bench.py [batch]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench_env(env, B: int, T: int = 25, n_iters: int = 4) -> float:
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

    out = rollout(states, jax.random.PRNGKey(1))
    np.asarray(out.sim.q[0, 0])  # hard sync (axon: block_until_ready lies)
    out = rollout(out, jax.random.PRNGKey(99))
    np.asarray(out.sim.q[0, 0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = rollout(out, jax.random.PRNGKey(2 + i))
    np.asarray(out.sim.q[0, 0])
    dt = time.perf_counter() - t0
    return B * T * n_iters / dt


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        from jiminy_tpu.envs import ANYmalEnv

        envs = {
            "fourier_substep_kernel": ANYmalEnv(observe="state", terrain="fourier"),
            "stairs_substep_kernel": ANYmalEnv(observe="state", terrain="stairs"),
            "perlin_substep_kernel": ANYmalEnv(observe="state", terrain="perlin"),
            "perlin_grid_chain_kernel": ANYmalEnv(observe="state", terrain="perlin_grid"),
        }
    results = {}
    for name, env in envs.items():
        results[name] = bench_env(env, B)
        print(f"{name}: {results[name]:,.0f} env-steps/s", flush=True)
    print(
        json.dumps(
            {
                "metric": "rough_terrain_env_steps_per_sec_b%d" % B,
                "fourier_substep_kernel": round(
                    results["fourier_substep_kernel"]
                ),
                "stairs_substep_kernel": round(
                    results["stairs_substep_kernel"]
                ),
                "perlin_substep_kernel": round(
                    results["perlin_substep_kernel"]
                ),
                "perlin_grid_chain_kernel": round(
                    results["perlin_grid_chain_kernel"]
                ),
                "speedup": round(
                    results["perlin_substep_kernel"]
                    / results["perlin_grid_chain_kernel"],
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
