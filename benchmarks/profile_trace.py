"""Capture a TensorBoard/XProf trace of the flagship env step.

Usage: python benchmarks/profile_trace.py [outdir]
Then: tensorboard --logdir <outdir>  (or xprof).

This is the framework's tracing story (SURVEY.md §5: jax.profiler traces
replace the reference's telemetry wall-time counters for kernel-level
work).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jiminy_tpu_trace"
    from jiminy_tpu.envs import ANYmalEnv

    env = ANYmalEnv(observe="state")
    B = 4096
    states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    step = jax.jit(jax.vmap(env.step))
    a = jnp.zeros((B, 12))
    out = step(states, a)
    jax.block_until_ready(out)  # compile outside the trace

    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = step(out, a)
        jax.block_until_ready(out)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
