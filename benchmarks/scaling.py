"""Weak-scaling benchmark of the distributed PPO step over a device mesh.

Measures env-steps/s of the full sharded train step (rollout through
PGS-contact physics + pmean'd learner update) at fixed PER-DEVICE batch
while the mesh grows — the harness for BASELINE.md's "≥80% scaling
efficiency at N≥2 hosts" target.

On real multi-chip hardware this reports true ICI/DCN scaling. On a CPU
host it still runs (virtual mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which validates
the program but NOT bandwidth — virtual devices share one socket's
FLOPs, so expect "efficiency" far below 1 there; use it for shape/
compile checks only.

Usage:
    python benchmarks/scaling.py [per_device_envs] [env]
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python benchmarks/scaling.py 32
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# honor JAX_PLATFORMS=cpu via jax.config: TPU plugins (axon) ignore the
# plain env var, which silently turned the virtual-mesh run into a
# 1-device TPU run (CLAUDE.md rule 2)
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh


def bench_mesh(env, n_devices: int, per_device: int, iters: int = 10):
    from jiminy_tpu.rl import PPOConfig
    from jiminy_tpu.rl.distributed import make_distributed_train

    mesh = Mesh(jax.devices()[:n_devices], ("data",))
    cfg = PPOConfig(
        num_envs=per_device * n_devices,
        rollout_len=16,
        epochs=1,
        minibatches=1,
        hidden=(64, 64),
    )
    init_fn, train_step, _ = make_distributed_train(env, cfg, mesh)
    carry = init_fn(jax.random.PRNGKey(0))
    carry, _ = train_step(carry)  # compile
    jax.block_until_ready(carry[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, _ = train_step(carry)
    jax.block_until_ready(carry[0])
    dt = (time.perf_counter() - t0) / iters
    return cfg.num_envs * cfg.rollout_len / dt


def main():
    per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    env_name = sys.argv[2] if len(sys.argv) > 2 else "anymal"
    import json

    import jiminy_tpu.envs as E

    # privileged obs: this benchmark measures the sharded train-step
    # program, not the sensor pipeline (whose compile is minutes)
    kw = {} if env_name == "cartpole" else {"observe": "state"}
    env = {
        "anymal": E.ANYmalEnv,
        "atlas": E.AtlasEnv,
        "cartpole": E.CartPoleEnv,
    }[env_name](**kw)

    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    base = None
    eff = 1.0
    print(f"devices={ndev} per_device_envs={per_device} env={env_name}")
    for n in sizes:
        sps = bench_mesh(env, n, per_device)
        base = base if base is not None else sps
        eff = sps / (base * n)
        print(
            f"mesh={n:3d}  {sps:12,.0f} env-steps/s   "
            f"weak-scaling eff {eff:6.1%}",
            flush=True,
        )
    # unattended one-line verdict against BASELINE.md's ≥80% target
    # (meaningful only on real multi-device hardware: virtual CPU
    # devices share one socket, so flag that case explicitly)
    result = {
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction",
        "n_devices": sizes[-1],
        "per_device_envs": per_device,
        "env": env_name,
        "platform": platform,
        "target": 0.8,
        "pass": bool(eff >= 0.8),
        "hardware_valid": platform != "cpu",
    }
    print(json.dumps(result))
    out = pathlib.Path(__file__).resolve().parents[1] / "SCALING.json"
    out.write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
