"""Train an ANYmal locomotion policy with PPO on the local device.

The whole loop (4096 envs × PGS physics × PD inner loop × PPO update)
is two XLA programs (reset, train_step). Artifacts: metrics JSONL +
telemetry log + learning-curve HTML + Orbax checkpoints.

Usage: python examples/train_anymal.py [--iters 2000] [--out /tmp/anymal_run]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--num-envs", type=int, default=2048)
    ap.add_argument("--out", default="/tmp/anymal_run")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from jiminy_tpu.checkpoint import CheckpointManager
    from jiminy_tpu.envs import ANYmalEnv
    from jiminy_tpu.rl import PPOConfig
    from jiminy_tpu.rl.ppo import make_train_fn

    env = ANYmalEnv(observe="state", max_steps=500)
    cfg = PPOConfig(
        num_envs=args.num_envs,
        rollout_len=32,
        minibatches=8,
        epochs=4,
        hidden=(256, 256),
        lr=3e-4,
        ent_coef=0.005,
        symmetry_coef=0.1,
        anneal_lr=True,
        total_iters=args.iters,
    )
    init_fn, train_step, policy = make_train_fn(
        env, cfg, symmetry_fn=env.symmetry_fn
    )
    carry = init_fn(jax.random.PRNGKey(args.seed), cfg.num_envs)
    step = jax.jit(train_step)
    mgr = CheckpointManager(out / "ckpt", max_to_keep=2)

    steps_per_iter = cfg.num_envs * cfg.rollout_len
    metrics_path = out / "metrics.jsonl"
    t0 = time.perf_counter()
    with open(metrics_path, "w") as f:
        for i in range(args.iters):
            carry, metrics = step(carry)
            if i % 10 == 0 or i == args.iters - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["iter"] = i
                m["env_steps"] = (i + 1) * steps_per_iter
                m["wall_s"] = time.perf_counter() - t0
                f.write(json.dumps(m) + "\n")
                f.flush()
                if i % 100 == 0:
                    sps = m["env_steps"] / m["wall_s"]
                    print(
                        f"iter {i:5d}  reward {m['reward_mean']:7.3f}  "
                        f"done% {100 * m['episode_done_frac']:5.2f}  "
                        f"kl {m['approx_kl']:.4f}  {sps:,.0f} steps/s",
                        flush=True,
                    )
            if i and i % 500 == 0:
                mgr.save(i, carry)
    mgr.save(args.iters, carry)
    mgr.close()

    # learning-curve report
    rows = [json.loads(l) for l in open(metrics_path)]
    from jiminy_tpu.telemetry import stack_log
    from jiminy_tpu.plot import export_html

    log = stack_log(
        np.array([r["env_steps"] for r in rows], np.float32),
        {
            "reward_mean": np.array([r["reward_mean"] for r in rows]),
            "episode_done_frac": np.array(
                [r["episode_done_frac"] for r in rows]
            ),
            "entropy": np.array([r["entropy"] for r in rows]),
            "v_loss": np.array([r["v_loss"] for r in rows]),
        },
        constants={"config": str(cfg)},
    )
    export_html(log, out / "learning_curves.html", title="ANYmal PPO")
    total = args.iters * steps_per_iter
    dt = time.perf_counter() - t0
    print(
        f"done: {total:,} env-steps in {dt:,.0f}s "
        f"({total / dt:,.0f} steps/s incl. learning)"
    )
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
