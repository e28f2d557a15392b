"""Roofline / headroom accounting for the bench config (VERDICT r3 #9).

Answers "is the bench number near this chip's ceiling?" with data:

1. **Batch-scaling curve** — env-steps/s at B = 256 … 16384. If
   steps/s still grows past the bench's B=4096, the workload at 4096 is
   launch/latency-bound and the chip has throughput headroom equal to
   the curve's plateau.
2. **HBM traffic** — bytes in+out of the fused substep kernel per env
   step × achieved steps/s, vs the v5e's ~819 GB/s peak. The physics
   state is tiny (hundreds of bytes/env), so a low fraction here is
   the *expected* signature of a latency-bound workload, not waste.
3. **Launch-rate ceiling** — kernel launches/s at the smallest batch,
   an upper bound on what any launch-per-step design can reach.

Writes ROOFLINE.json and prints one line per measurement.
Run on the TPU: ``python benchmarks/roofline.py``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

HBM_PEAK_GBS = 819.0  # TPU v5e HBM bandwidth (public spec)


def measure(env, B: int, T: int = 25, n_iters: int = 4) -> float:
    """Mirror bench.py's methodology exactly: a jitted lax.scan of T env
    steps, synced via np.asarray (device→host copy) — NOT
    jax.block_until_ready, which returns early through the axon TPU
    tunnel and over-reports by >10× (bench.py:52-54)."""
    import numpy as np

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            st, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(
                k, (B, env.action_size), minval=-1.0, maxval=1.0
            )
            st = jax.vmap(env.step)(st, a)
            return (st, key), None

        (st, _), _ = jax.lax.scan(body, (states, key), None, length=T)
        return st

    out = rollout(states, jax.random.PRNGKey(1))
    np.asarray(out.sim.q[0, 0])
    out = rollout(out, jax.random.PRNGKey(99))  # warm steady-state
    np.asarray(out.sim.q[0, 0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = rollout(out, jax.random.PRNGKey(2 + i))
    np.asarray(out.sim.q[0, 0])
    dt = time.perf_counter() - t0
    return B * T * n_iters / dt


def state_bytes_per_env(env) -> int:
    """f32 bytes read+written by one fused substep-kernel launch per
    env: q, v, lam, contact forces, a, tau in and/or out (counted once
    in + once out for carried state, once for outputs)."""
    tree = env.tree
    nc = env.engine.n_constraint_rows
    f = 4
    inputs = (tree.nq + tree.nv + env.robot.nmotors + nc + 6) * f
    outputs = (tree.nq + tree.nv + nc + 1 + 3 * tree.ncp
               + tree.nv + tree.nv) * f
    return inputs + outputs


def main() -> None:
    from jiminy_tpu.envs import ANYmalEnv

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # the exact bench.py config
        env = ANYmalEnv(observe="state", step_dt=0.02, sim_dt=5e-3, pgs_iters=8)
    platform = jax.devices()[0].platform
    curve = {}
    for B in (256, 1024, 4096, 8192, 16384):
        sps = measure(env, B)
        curve[B] = sps
        print(f"B={B:6d}  {sps:12,.0f} env-steps/s", flush=True)
    peak_B = max(curve, key=curve.get)
    bench_sps = curve[4096]
    headroom = curve[peak_B] / bench_sps
    bpe = state_bytes_per_env(env)
    # one launch per env step (multi-substep fusion default ON)
    hbm_gbs = bench_sps * bpe / 1e9
    launch_rate = curve[256] / 256  # steps/s at tiny batch ≈ launches/s
    result = {
        "metric": "roofline_bench_config",
        "platform": platform,
        "bench_env_steps_per_s_B4096": round(bench_sps),
        "peak_env_steps_per_s": round(curve[peak_B]),
        "peak_batch": peak_B,
        "throughput_headroom_vs_bench": round(headroom, 3),
        "kernel_bytes_per_env_step": bpe,
        "achieved_hbm_gbs_at_B4096": round(hbm_gbs, 2),
        "hbm_peak_gbs": HBM_PEAK_GBS,
        "hbm_fraction": round(hbm_gbs / HBM_PEAK_GBS, 5),
        "launches_per_s_at_B256": round(launch_rate),
        "curve": {str(k): round(v) for k, v in curve.items()},
        "verdict": (
            "latency/launch-bound at B=4096 (steps/s grows with batch; "
            "HBM far from peak)" if headroom > 1.15 else
            "near this chip's plateau at the bench batch"
        ),
    }
    print(json.dumps(result))
    out = pathlib.Path(__file__).resolve().parents[1] / "ROOFLINE.json"
    out.write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
