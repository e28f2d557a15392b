"""Per-stage timing breakdown on the current backend.

Reference: jiminy telemeters per-step wall time (SURVEY.md §5
"Tracing/profiling"); here the equivalent developer tool is a µs/env
table per pipeline stage, run on whatever backend is active (TPU by
default, CPU with JAX_PLATFORMS=cpu).

Usage: python benchmarks/stage_timing.py [batch]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return name, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from jiminy_tpu.core import algos
    from jiminy_tpu.engine.engine import Engine, EngineOptions
    from jiminy_tpu.math import linalg
    from jiminy_tpu.models.quadruped import make_anymal, stand_q

    robot = make_anymal()
    tree = robot.tree
    q0 = jnp.asarray(stand_q(tree))
    Q = jnp.tile(q0, (B, 1))
    V = jnp.zeros((B, tree.nv))
    U = jnp.zeros((B, tree.nv))

    rows = [
        bench("kinematics", lambda Q, V: jax.vmap(
            lambda q, v: algos.kinematics(tree, q, v)[1][-1])(Q, V), Q, V),
        bench("rnea", lambda Q, V: jax.vmap(
            lambda q, v: algos.rnea(tree, q, v, jnp.zeros(tree.nv)))(Q, V), Q, V),
        bench("aba", lambda Q, V, U: jax.vmap(
            lambda q, v, u: algos.aba(tree, q, v, u))(Q, V, U), Q, V, U),
        bench("crba+cholesky", lambda Q: jax.vmap(
            lambda q: linalg.cholesky(algos.crba(tree, q)))(Q), Q),
        bench("integrate", lambda Q, V: jax.vmap(
            lambda q, v: algos.integrate(tree, q, v, 1e-3))(Q, V), Q, V),
    ]
    eng = Engine(
        tree, EngineOptions(dt=2.5e-3, contact_model="constraint",
                            pgs_iters=8), motors=robot.motors,
    )
    S = jax.jit(jax.vmap(lambda q: eng.reset(q=q)))(Q)
    rows.append(
        bench("full constraint substep", lambda S: jax.vmap(
            lambda s: eng.step(s, jnp.zeros(12), n_substeps=1))(S), S, n=10)
    )
    print(f"backend={jax.devices()[0].platform} batch={B}")
    for name, dt in rows:
        print(f"{name:26s} {dt * 1e3:8.2f} ms   {dt / B * 1e6:6.2f} us/env")


if __name__ == "__main__":
    main()
