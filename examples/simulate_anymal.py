"""Classic single-robot workflow: build from URDF + hardware TOML,
simulate under a PD controller, write logs, plots and a replay.

Usage: python examples/simulate_anymal.py [--out /tmp/anymal_sim]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/anymal_sim")
    ap.add_argument("--t-end", type=float, default=3.0)
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from jiminy_tpu import EngineOptions, Simulator
    from jiminy_tpu.models.quadruped import (
        anymal_hardware,
        anymal_urdf,
        stand_q,
    )
    from jiminy_tpu.plot import export_html, plot_log
    from jiminy_tpu.viewer import replay_from_log

    sim = Simulator.build(
        anymal_urdf(),
        anymal_hardware(),
        freeflyer=True,
        options=EngineOptions(
            dt=2.5e-3, contact_model="constraint", pgs_iters=8
        ),
    )
    tree = sim.tree
    q0 = jnp.asarray(stand_q(tree))
    motors = sim.robot.motors
    targets, _ = motors.joint_state(q0, jnp.zeros(tree.nv))

    def pd(q, v, t):
        qm, vm = motors.joint_state(q, v)
        # squat cycle: sinusoidal knee targets on top of the stand pose
        squat = 0.2 * jnp.sin(2.0 * jnp.pi * 0.5 * t)
        tgt = targets + squat * jnp.asarray(
            [0.0, 1.0, -1.8] * 4, jnp.float32
        )
        return 80.0 * (tgt - qm) - 2.0 * vm

    final, log = sim.simulate(args.t_end, q0=q0, controller=pd)
    log.write_binary(out / "run.jtpu")
    log.write_hdf5(out / "run.h5")
    plot_log(log, save_path=out / "plots")
    export_html(log, out / "report.html", title="ANYmal squat")
    replay_from_log(tree, log, out / "replay.html", title="ANYmal squat")
    print(f"final z={float(final.q[2]):.3f}, artifacts in {out}")


if __name__ == "__main__":
    main()
