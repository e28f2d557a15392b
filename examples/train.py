"""Train any bundled locomotion env with PPO on the local device.

Usage: python examples/train.py --env cassie --iters 6000 --out /tmp/run
Envs: anymal (with mirror-symmetry surrogate), cassie, ant, spotmicro,
atlas, cartpole, acrobot.
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


def _solver_options(solver: str):
    from jiminy_tpu.engine.engine import EngineOptions

    return EngineOptions(
        dt=2e-3, contact_model="constraint", pgs_iters=8,
        constraint_solver=solver, compute_solver_residual=False,
    )


def make_env(name: str, max_steps: int, terrain=None, push=0.0,
             observe="state", sensor_delay=0.0, imu_noise=0.0,
             encoder_noise=0.0, mdp="hardcoded", solver=None,
             push_duration=0.1, randomize=None, self_collision=False):
    import jiminy_tpu.envs as E

    walker_kwargs = {"push_duration": push_duration}
    if randomize:
        from jiminy_tpu.engine import ModelRandomization

        walker_kwargs["model_randomization"] = ModelRandomization(
            mass_scale=(1 - randomize, 1 + randomize),
            com_offset=0.02 * randomize / 0.2,
            inertia_scale=(1 - randomize, 1 + randomize),
            motor_gain=(1 - randomize / 2, 1 + randomize / 2),
        )
    if name == "anymal":
        mdp_kwargs = {}
        if mdp == "declarative":
            # reward/termination composed from the L4 declarative layer
            # (quantities + compositions) instead of the hand-coded MDP
            reward_fn, termination_fn = E.anymal_declarative_mdp()
            mdp_kwargs = {
                "reward_fn": reward_fn, "termination_fn": termination_fn,
            }
        return E.ANYmalEnv(
            max_steps=max_steps, terrain=terrain, push_magnitude=push,
            observe=observe, sensor_delay=sensor_delay,
            imu_noise=imu_noise, encoder_noise=encoder_noise,
            **mdp_kwargs, **walker_kwargs,
        )
    if name == "cassie":
        return E.CassieEnv(
            sim_dt=2e-3, max_steps=max_steps, target_speed=0.4,
            push_magnitude=push, observe=observe,
            sensor_delay=sensor_delay, imu_noise=imu_noise,
            encoder_noise=encoder_noise, self_collision=self_collision,
            **({"engine_options": _solver_options(solver)} if solver else {}),
            **walker_kwargs,
        )
    if name == "cassie_flex":
        # 3-DoF hip flexibility (spherical joints — in the whole-substep
        # kernel since round 5; --solver pallas forces the old chain
        # path). Forwards the full sensor/self-collision config like the
        # rigid cassie branch — silently dropping --imu-noise etc. would
        # fake a robustness artifact (round-5 review finding).
        return E.CassieEnv(
            sim_dt=2e-3, max_steps=max_steps, target_speed=0.4,
            push_magnitude=push, flexibility=True, observe=observe,
            sensor_delay=sensor_delay, imu_noise=imu_noise,
            encoder_noise=encoder_noise, self_collision=self_collision,
            **({"engine_options": _solver_options(solver)} if solver else {}),
            **walker_kwargs,
        )
    if name == "ant":
        return E.AntEnv(
            max_steps=max_steps, push_magnitude=push, observe=observe,
            **walker_kwargs
        )
    if name == "spotmicro":
        return E.SpotmicroEnv(
            max_steps=max_steps, push_magnitude=push, observe=observe,
            sensor_delay=sensor_delay, imu_noise=imu_noise,
            encoder_noise=encoder_noise, **walker_kwargs,
        )
    if name == "atlas":
        return E.AtlasEnv(
            max_steps=max_steps, target_speed=0.3, push_magnitude=push,
            observe=observe, sensor_delay=sensor_delay,
            imu_noise=imu_noise, encoder_noise=encoder_noise,
            self_collision=self_collision,
            **walker_kwargs,
        )
    if name == "cartpole":
        return E.CartPoleEnv()
    if name == "acrobot":
        return E.AcrobotEnv()
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="anymal")  # incl. cassie_flex (3-DoF hip flexibility)
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--num-envs", type=int, default=2048)
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ent-coef", type=float, default=0.005)
    ap.add_argument(
        "--terrain", default=None,
        choices=[None, "flat", "perlin", "perlin_grid", "stairs",
                 "fourier"]
    )
    ap.add_argument("--push", type=float, default=0.0,
                    help="random push force magnitude (N), walker envs")
    ap.add_argument("--push-duration", type=float, default=0.1,
                    help="push duration (s); impulse = push × duration")
    ap.add_argument("--randomize", type=float, default=None,
                    help="model domain randomization half-range, e.g. "
                    "0.2 → mass/inertia ±20%%, motor gain ±10%%, CoM "
                    "±2 cm (rides the randomized whole-substep kernel)")
    ap.add_argument("--self-collision", action="store_true",
                    help="cassie: declare L/R thigh/shin/tarsus capsule "
                    "self-collision pairs in the PGS (resolved "
                    "in-kernel on the whole-substep fast path)")
    ap.add_argument("--ent-anneal", action="store_true",
                    help="linearly anneal the entropy bonus to 0 over "
                    "training so the MEAN policy sharpens into the "
                    "deployable artifact (fixes dither-reliant gaits)")
    ap.add_argument("--observe", default="state",
                    choices=["state", "sensors"],
                    help="observation source: privileged state or the "
                    "delayed/biased/noisy sensor suite (walker envs)")
    ap.add_argument("--sensor-delay", type=float, default=0.0)
    ap.add_argument("--imu-noise", type=float, default=0.0)
    ap.add_argument("--encoder-noise", type=float, default=0.0)
    ap.add_argument("--mdp", default="hardcoded",
                    choices=["hardcoded", "declarative"],
                    help="anymal only: hand-coded reward/termination or "
                    "the equivalent composed from the declarative "
                    "quantities/compositions layer")
    ap.add_argument("--solver", default=None,
                    choices=[None, "xla", "pallas", "pallas_substep"],
                    help="cassie only: force the constraint-solver "
                    "backend (default: engine auto-select)")
    ap.add_argument("--fusion", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="override EngineOptions.substep_fusion (all "
                    "n_substeps in one kernel launch; default ON since "
                    "TPU validation — --no-fusion for per-substep "
                    "launches)")
    ap.add_argument("--pipeline", default=None,
                    help="comma-separated declarative wrapper layers, "
                    "e.g. 'stack:4,normalize' (build_pipeline dogfood); "
                    "disables the mirror-symmetry surrogate (obs layout "
                    "changes)")
    args = ap.parse_args()
    out = pathlib.Path(args.out or f"/tmp/{args.env}_run")
    out.mkdir(parents=True, exist_ok=True)

    from jiminy_tpu.checkpoint import CheckpointManager
    from jiminy_tpu.rl import MetricsLogger, PPOConfig
    from jiminy_tpu.rl.ppo import make_train_fn

    # persistent XLA compile cache: the sensor-path / fused-kernel
    # compiles are minutes (the round-4 "10× sensor tax" was mostly
    # first-compile time polluting the cumulative rate); warm re-runs
    # of the same config skip them entirely
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path.home() / ".cache" / "jiminy_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # env/tree construction is eager numpy/jnp work: keep it off the TPU
    # backend (each eager op is an axon tunnel round trip, ~400 s total)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        env = make_env(
            args.env, args.max_steps, args.terrain, args.push,
            args.observe, args.sensor_delay, args.imu_noise,
            args.encoder_noise, args.mdp, args.solver,
            push_duration=args.push_duration, randomize=args.randomize,
            self_collision=args.self_collision,
        )
        if args.fusion is not None:
            env.engine.set_options({"substep_fusion": args.fusion})
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
    cfg = PPOConfig(
        num_envs=args.num_envs,
        rollout_len=32,
        minibatches=8,
        epochs=4,
        hidden=(256, 256),
        lr=3e-4,
        ent_coef=args.ent_coef,
        symmetry_coef=0.1 if hasattr(env, "symmetry_fn") else 0.0,
        anneal_lr=True,
        anneal_ent=args.ent_anneal,
        total_iters=args.iters,
    )
    init_fn, train_step, policy = make_train_fn(
        env, cfg, symmetry_fn=getattr(env, "symmetry_fn", None)
    )
    carry = init_fn(jax.random.PRNGKey(args.seed), cfg.num_envs)
    step = jax.jit(train_step)
    mgr = CheckpointManager(out / "ckpt", max_to_keep=2)

    steps_per_iter = cfg.num_envs * cfg.rollout_len
    t0 = time.perf_counter()
    last_t, last_steps = t0, 0
    with MetricsLogger(out, run_name=f"{args.env}-seed{args.seed}") as lg:
        for i in range(args.iters):
            carry, metrics = step(carry)
            if i % 10 == 0 or i == args.iters - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["iter"] = i
                m["env_steps"] = (i + 1) * steps_per_iter
                lg.log(i, m)
                if i % 100 == 0:
                    # marginal rate since the last print is the honest
                    # steady-state number — the cumulative one is
                    # dominated by first-compile time early on (the
                    # round-4 "sensor tax" misread)
                    now = time.perf_counter()
                    marginal = (m["env_steps"] - last_steps) / max(
                        now - last_t, 1e-9
                    )
                    last_t, last_steps = now, m["env_steps"]
                    print(
                        f"iter {i:5d} reward {m['reward_mean']:7.3f} "
                        f"done% {100 * m['episode_done_frac']:5.2f} "
                        f"kl {m['approx_kl']:.4f} "
                        f"{m['env_steps'] / (now - t0):,.0f} steps/s "
                        f"(marginal {marginal:,.0f})",
                        flush=True,
                    )
            if i and i % 1000 == 0:
                mgr.save(i, carry)
    mgr.save(args.iters, carry)
    mgr.close()

    from jiminy_tpu.rl.evaluate import evaluate

    params = carry[0]
    eval_env = env
    if args.pipeline:
        # normalization statistics are part of the trained artifact:
        # evaluate with them FROZEN at the training values (fresh resets
        # would otherwise normalize with cold unit stats)
        from jiminy_tpu.envs.pipeline import freeze_pipeline_stats

        eval_env = freeze_pipeline_stats(env, carry[2])
    stats = evaluate(
        eval_env,
        lambda obs: policy.action_dist(params, obs)[0]
        if eval_env.discrete_actions is None
        else jax.numpy.argmax(policy.action_dist(params, obs), -1),
        n_envs=256,
        n_steps=args.max_steps - 1,
        key=jax.random.PRNGKey(123),
    )
    (out / "eval.json").write_text(json.dumps(stats, indent=1))
    print("eval:", stats)
    total = args.iters * steps_per_iter
    dt = time.perf_counter() - t0
    print(f"done: {total:,} env-steps in {dt:,.0f}s ({total / dt:,.0f}/s)")


if __name__ == "__main__":
    main()
