"""Evaluate a trained artifact on any bundled env / solver backend.

The eval-only counterpart of examples/train.py (reference:
``BaseJiminyEnv.evaluate`` and the rllib checkpoint-evaluate helpers,
SURVEY.md §2.4 "Env base" / §2.5). Restores the policy params with
``checkpoint.restore_raw`` (template-free, works across carry-layout
changes) and runs ``rl.evaluate``'s batched greedy rollout.

Usage:
    python examples/evaluate.py --env cassie --run artifacts/cassie_run
    python examples/evaluate.py --env cassie --run /tmp/cassie_kernel \\
        --solver pallas_substep          # cross-backend eval parity
    python examples/evaluate.py --env anymal --run artifacts/anymal_run \\
        --substep-fusion                 # fused multi-substep path
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from train import make_env  # noqa: E402 (sibling example module)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="anymal")
    ap.add_argument("--run", required=True,
                    help="artifact dir containing ckpt/ (train.py --out)")
    ap.add_argument("--n-envs", type=int, default=256)
    ap.add_argument("--n-steps", type=int, default=499)
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--terrain", default=None)
    ap.add_argument("--observe", default="state")
    ap.add_argument("--self-collision", action="store_true",
                    help="cassie: same self-collision pairs the run was "
                    "trained with")
    ap.add_argument("--solver", default=None,
                    choices=[None, "xla", "pallas", "pallas_substep"],
                    help="force the constraint-solver backend (cassie)")
    ap.add_argument("--substep-fusion", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="override EngineOptions.substep_fusion "
                    "(default ON since TPU validation)")
    ap.add_argument("--pipeline", default=None,
                    help="declarative wrapper layers the run was trained "
                    "with (same syntax as train.py); normalization stats "
                    "are restored FROZEN from the checkpointed carry")
    ap.add_argument("--out", default=None,
                    help="write stats JSON here (default: stdout only)")
    args = ap.parse_args()

    from jiminy_tpu.checkpoint import restore_raw
    from jiminy_tpu.rl import PPOConfig
    from jiminy_tpu.rl.evaluate import evaluate
    from jiminy_tpu.rl.ppo import make_train_fn

    # env/tree construction is eager numpy/jnp work: keep it off the TPU
    # backend (each eager op is an axon tunnel round trip)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        env = make_env(
            args.env, args.max_steps, terrain=args.terrain,
            observe=args.observe, solver=args.solver,
            self_collision=args.self_collision,
        )
        if args.substep_fusion is not None:
            env.engine.set_options(
                {"substep_fusion": args.substep_fusion}
            )
        if args.pipeline:
            from jiminy_tpu.envs.pipeline import build_pipeline

            layers = []
            for part in args.pipeline.split(","):
                kind, _, arg = part.partition(":")
                spec = {"type": kind}
                if kind == "stack":
                    spec["n"] = int(arg or 4)
                layers.append(spec)
            env = build_pipeline(env, layers)
        cfg = PPOConfig(num_envs=args.n_envs, hidden=(256, 256))
        _, _, policy = make_train_fn(
            env, cfg, symmetry_fn=getattr(env, "symmetry_fn", None)
        )
        raw = restore_raw(pathlib.Path(args.run) / "ckpt")
        params = raw[0] if isinstance(raw, (list, tuple)) else raw["0"]
        if args.pipeline:
            # normalization statistics are part of the trained artifact —
            # freeze them into the eval env from the checkpointed carry
            from jiminy_tpu.envs.pipeline import freeze_pipeline_stats

            states = raw[2] if isinstance(raw, (list, tuple)) else raw["2"]
            env = freeze_pipeline_stats(env, states)

    if env.discrete_actions is None:
        policy_fn = lambda obs: policy.action_dist(params, obs)[0]
    else:
        policy_fn = lambda obs: jax.numpy.argmax(
            policy.action_dist(params, obs), -1
        )
    stats = evaluate(
        env, policy_fn, n_envs=args.n_envs, n_steps=args.n_steps,
        key=jax.random.PRNGKey(args.seed),
    )
    print(json.dumps(stats, indent=1))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
