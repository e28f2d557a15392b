"""On-device validation + A/B for multi-substep fusion (one kernel
launch per env step instead of one per substep).

Run me on the real TPU the moment the tunnel is up:

    python benchmarks/fusion_validate.py [batch]

Checks, in order (each prints PASS/FAIL):
  1. numerics: fused n_substeps=4 vs a scan of 4 single-kernel substeps
     ON DEVICE (same backend — isolates the fusion change), and both vs
     the CPU XLA reference (CLAUDE.md rule 1: TPU miscompiles never show
     up on CPU suites).
  2. trained-policy eval: the round-2 ANYmal artifact through the fused
     env path — return/fall-rate must match the unfused eval.
  3. throughput: bench.py-style random-action rollout, fused vs unfused.

If all pass, flip `EngineOptions.substep_fusion` default to True (and
WalkerEnv's default options) and re-run bench.py.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax
    import jax.numpy as jnp

    # initialise the default backend FIRST: under the axon plugin,
    # local_devices(backend="cpu") before any devices() call fails to
    # register the plugin platform
    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]

    with jax.default_device(cpu):
        from jiminy_tpu.engine.engine import (
            Engine,
            EngineOptions,
            PDController,
        )
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        q0 = jnp.asarray(stand_q(tree))

        def mk(fused: bool) -> Engine:
            return Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver="auto",
                    substep_fusion=fused,
                    compute_solver_residual=False,
                    dt=5e-3,
                    pgs_iters=8,
                ),
                motors=robot.motors,
                controller=PDController(60.0, 2.0),
            )

        eng_f, eng_u = mk(True), mk(False)
        assert eng_f._substep_fn is not None, "substep kernel not engaged"
        assert eng_f._substep_spec.torque is not None, "torque not baked"

        kq = jax.random.PRNGKey(0)
        nb_test = 256
        qb = jnp.tile(q0, (nb_test, 1)) + 0.02 * jax.random.normal(
            kq, (nb_test, tree.nq)
        )
        quat = qb[:, 3:7]
        qb = qb.at[:, 3:7].set(
            quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
        )
        u = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (nb_test, robot.nmotors)
        )

    # ---- 1. numerics --------------------------------------------------
    def run(eng, n_substeps=4):
        states = jax.jit(jax.vmap(lambda q: eng.reset(q=q)))(qb)
        step = jax.jit(
            jax.vmap(lambda s, uu: eng.step(s, uu, n_substeps=n_substeps))
        )
        out = step(states, u)
        np.asarray(out.q)  # hard sync (axon block_until_ready lies)
        return out

    t0 = time.time()
    out_f = run(eng_f)
    print(f"fused compile+run {time.time()-t0:.1f}s", flush=True)
    out_u = run(eng_u)

    dq = float(jnp.max(jnp.abs(out_f.q - out_u.q)))
    dv = float(jnp.max(jnp.abs(out_f.v - out_u.v)))
    da = float(jnp.max(jnp.abs(out_f.a - out_u.a)))
    ok = dq < 1e-4 and dv < 1e-2 and da < 2.0
    print(f"numerics fused-vs-unfused: dq={dq:.2e} dv={dv:.2e} "
          f"da={da:.2e}  {'PASS' if ok else 'FAIL'}", flush=True)

    # vs CPU XLA reference
    with jax.default_device(cpu):
        eng_cpu = Engine(
            tree,
            EngineOptions(
                contact_model="constraint",
                constraint_solver="xla",
                substep_fusion=False,
                compute_solver_residual=False,
                dt=5e-3,
                pgs_iters=8,
            ),
            motors=robot.motors,
            controller=PDController(60.0, 2.0),
        )
        states = jax.jit(jax.vmap(lambda q: eng_cpu.reset(q=q)))(qb)
        step = jax.jit(
            jax.vmap(lambda s, uu: eng_cpu.step(s, uu, n_substeps=4))
        )
        out_c = step(states, u)
    dqc = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(out_f.q)) -
                                jnp.asarray(np.asarray(out_c.q)))))
    dvc = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(out_f.v)) -
                                jnp.asarray(np.asarray(out_c.v)))))
    okc = dqc < 5e-4 and dvc < 5e-2
    print(f"numerics fused-vs-CPU-xla: dq={dqc:.2e} dv={dvc:.2e}  "
          f"{'PASS' if okc else 'FAIL'}", flush=True)

    # ---- 2. trained-policy eval (reuses examples/evaluate.py — one
    # copy of the restore/eval recipe) ----------------------------------
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parents[1]
    for fused in (False, True):
        cmd = [
            sys.executable, str(root / "examples" / "evaluate.py"),
            "--env", "anymal",
            "--run", str(root / "artifacts" / "anymal_run"),
            "--n-envs", "256",
        ]
        if fused:
            cmd.append("--substep-fusion")
        print(f"anymal eval fused={fused}:", flush=True)
        r = subprocess.run(cmd, check=False)
        if r.returncode:
            print(f"eval fused={fused} FAILED (rc={r.returncode})",
                  flush=True)

    # ---- 3. throughput ------------------------------------------------
    with jax.default_device(cpu):
        from jiminy_tpu.envs import ANYmalEnv

        env_fused = ANYmalEnv(observe="state")
        # flip fusion through set_options (also exercises the rebuild)
        env_fused.engine.set_options({"substep_fusion": True})
        envs = {"unfused": ANYmalEnv(observe="state"), "fused": env_fused}
    T, n_iters = 25, 4
    for name, env in envs.items():
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states = jax.jit(jax.vmap(env.reset))(keys)

        @jax.jit
        def rollout(states, key, env=env):
            def body(carry, _):
                st, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(
                    k, (B, 12), minval=-1.0, maxval=1.0
                )
                st = jax.vmap(env.step)(st, a)
                return (st, key), None

            (st, _), _ = jax.lax.scan(
                body, (states, key), None, length=T
            )
            return st

        out = rollout(states, jax.random.PRNGKey(1))
        np.asarray(out.sim.q[0, 0])
        out = rollout(out, jax.random.PRNGKey(99))
        np.asarray(out.sim.q[0, 0])
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = rollout(out, jax.random.PRNGKey(2 + i))
        np.asarray(out.sim.q[0, 0])
        dt_w = time.perf_counter() - t0
        print(f"{name}: {B*T*n_iters/dt_w:,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
