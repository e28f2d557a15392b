"""Golden-trajectory parity harness vs the reference C++ engine.

The reference correctness target (BASELINE.md; SURVEY.md §4 "cross-engine
parity") is: same URDF, same integrator settings, same initial state ⇒
trajectory match vs C++ Jiminy. The reference binary is not available in
this environment, so this module ships the *harness* — fixture schema,
recorder, comparator, CLI — such that populating `parity/fixtures/` with
trajectories recorded from the reference turns parity into a data task:

    python -m jiminy_tpu.parity run "parity/fixtures/*"

prints one JSON line per fixture (max drift in q/v + pass/fail vs the
fixture's tolerance) and a summary line compatible with BASELINE.json's
correctness metric.

Fixture layout (one directory per fixture, self-contained):

    <fixture>/
      meta.json   — see FixtureMeta below
      traj.npz    — t (T,), q (T, nq), v (T, nv), optional u (T, nu)
                    open-loop command table replayed zero-order-hold
      robot.urdf  — the model (copied in, so fixtures never dangle)
      hardware.toml (optional) — motor/sensor description

meta.json schema (all fields explicit so fixtures are auditable):

    {
      "name": "pendulum_rk4",
      "source": "jiminy_tpu-self" | "jiminy-cpp <version>",
      "freeflyer": false,
      "quat_convention": "xyzw",     # layout of quats in traj q columns;
                                      # both Pinocchio and jiminy_tpu are
                                      # natively "xyzw"; "wxyz" converts
      "engine_options": {...},        # EngineOptions field overrides
      "tolerance_q": 1e-6,            # max |q - q_ref| accepted
      "tolerance_v": 1e-5,
      "duration": 2.0,
      "notes": "..."
    }

Parity mode runs float64 on CPU (the reference integrates in double;
SURVEY.md §7 hard-parts: "parity mode runs f64 + RK4") — the comparator
force-enables x64 and the CPU platform before any computation.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import sys
from pathlib import Path

import numpy as np

_PARITY_DEFAULTS = {
    "source": "jiminy_tpu-self",
    "freeflyer": False,
    "quat_convention": "xyzw",
    "engine_options": {},
    "tolerance_q": 1e-6,
    "tolerance_v": 1e-5,
    "notes": "",
}


def _force_parity_backend() -> None:
    """f64 + CPU, before any jax computation (the axon TPU plugin ignores
    the JAX_PLATFORMS env var — must go through jax.config)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def _quat_to_xyzw(q: np.ndarray, convention: str, freeflyer: bool):
    """Convert the free-flyer quaternion columns (3:7) of a (T, nq) q
    table to our native xyzw layout (same as Pinocchio's)."""
    if not freeflyer or convention == "xyzw":
        return q
    if convention != "wxyz":
        raise ValueError(f"unknown quat_convention {convention!r}")
    out = q.copy()
    out[..., 6] = q[..., 3]  # w last
    out[..., 3:6] = q[..., 4:7]  # xyz
    return out


@dataclasses.dataclass
class ParityReport:
    name: str
    source: str
    n_samples: int
    max_drift_q: float
    max_drift_v: float
    tolerance_q: float
    tolerance_v: float
    ok: bool

    def json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def _parse_constraints(specs, tree) -> tuple:
    """Declarative kinematic constraints in meta.json (fixtures like the
    rolling wheel need them; the reference's WheelConstraint /
    DistanceConstraint — SURVEY.md §2.1 "Constraints"):

        "constraints": [{"type": "wheel", "frame": "wheel_frame",
                         "radius": 0.2, "axis": [0,1,0],
                         "baumgarte_freq": 20.0}, ...]
    """
    import jax.numpy as jnp

    from jiminy_tpu.engine.constraints import (
        DistanceConstraint,
        WheelConstraint,
    )

    out = []
    for c in specs:
        kind = c["type"]
        if kind == "wheel":
            out.append(
                WheelConstraint(
                    frame=tree.frame_name.index(c["frame"]),
                    radius=jnp.asarray(float(c["radius"])),
                    axis=jnp.asarray(c.get("axis", [0.0, 1.0, 0.0])),
                    baumgarte_freq=jnp.asarray(
                        float(c.get("baumgarte_freq", 20.0))
                    ),
                )
            )
        elif kind == "distance":
            out.append(
                DistanceConstraint(
                    frame1=tree.frame_name.index(c["frame1"]),
                    frame2=tree.frame_name.index(c["frame2"]),
                    distance=jnp.asarray(float(c["distance"])),
                    baumgarte_freq=jnp.asarray(
                        float(c.get("baumgarte_freq", 20.0))
                    ),
                )
            )
        else:
            raise ValueError(f"unknown constraint type {kind!r}")
    return tuple(out)


def _build_sim(fix: Path, meta: dict):
    from jiminy_tpu.engine.engine import EngineOptions
    from jiminy_tpu.robot import build_robot
    from jiminy_tpu.simulator import Simulator

    hardware = fix / "hardware.toml"
    opts_dict = dict(meta.get("engine_options", {}))
    contacts = opts_dict.pop("contacts", None)
    opts = EngineOptions(**opts_dict)
    if contacts:
        opts = dataclasses.replace(
            opts, contacts=dataclasses.replace(opts.contacts, **contacts)
        )
    robot = build_robot(
        fix / "robot.urdf",
        hardware=str(hardware) if hardware.exists() else None,
        freeflyer=bool(meta.get("freeflyer", False)),
    )
    return Simulator(
        robot,
        options=opts,
        constraints=_parse_constraints(
            meta.get("constraints", []), robot.tree
        ),
    )


def _run_f64(sim, q0, v0, n_steps: int, u_tab: np.ndarray | None):
    """Trajectory at FULL f64 precision via a direct engine scan — the
    Simulator's telemetry downcasts columns to f32, which would swamp
    the parity tolerances."""
    import jax
    import jax.numpy as jnp

    eng = sim.engine
    dt = float(eng.options.dt)
    n_cmd = sim.robot.nmotors or sim.tree.nv
    u_j = (
        jnp.asarray(u_tab, jnp.float64)
        if u_tab is not None
        else jnp.zeros((1, n_cmd), jnp.float64)
    )
    n_u = u_j.shape[0]

    def body(st, _):
        i = jnp.clip(jnp.int32(jnp.floor(st.t / dt + 0.5)), 0, n_u - 1)
        st = eng.step(st, u_j[i], n_substeps=1)
        return st, (st.q, st.v)

    st0 = eng.reset(
        q=jnp.asarray(q0, jnp.float64), v=jnp.asarray(v0, jnp.float64)
    )
    _, (qs, vs) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n_steps)
    )(st0)
    q = np.concatenate([np.asarray(q0, np.float64)[None], np.asarray(qs)])
    v = np.concatenate([np.asarray(v0, np.float64)[None], np.asarray(vs)])
    return q, v  # (n_steps+1, ·) at t = 0, dt, ..., n_steps*dt


def compare(fixture: str | Path) -> ParityReport:
    """Replay one fixture through the f64 engine and report max drift."""
    _force_parity_backend()
    fix = Path(fixture)
    meta = {**_PARITY_DEFAULTS, **json.loads((fix / "meta.json").read_text())}
    data = np.load(fix / "traj.npz")
    t_ref = np.asarray(data["t"], np.float64)
    sim = _build_sim(fix, meta)
    tree = sim.tree
    q_ref = _quat_to_xyzw(
        np.asarray(data["q"], np.float64),
        meta["quat_convention"], meta["freeflyer"],
    )
    v_ref = np.asarray(data["v"], np.float64)
    if q_ref.shape[1] != tree.nq or v_ref.shape[1] != tree.nv:
        raise ValueError(
            f"fixture dims (nq={q_ref.shape[1]}, nv={v_ref.shape[1]}) vs "
            f"model (nq={tree.nq}, nv={tree.nv})"
        )
    dt = float(sim.engine.options.dt)
    # fixture samples must sit on the engine's step grid
    idx = np.rint(t_ref / dt).astype(int)
    if not np.allclose(idx * dt, t_ref, atol=1e-9):
        raise ValueError("fixture times are not multiples of engine dt")

    u_tab = np.asarray(data["u"], np.float64) if "u" in data else None
    q_run, v_run = _run_f64(sim, q_ref[0], v_ref[0], int(idx.max()), u_tab)
    dq = np.max(np.abs(q_run[idx] - q_ref))
    dv = np.max(np.abs(v_run[idx] - v_ref))
    return ParityReport(
        name=meta.get("name", fix.name),
        source=meta["source"],
        n_samples=len(t_ref),
        max_drift_q=float(dq),
        max_drift_v=float(dv),
        tolerance_q=float(meta["tolerance_q"]),
        tolerance_v=float(meta["tolerance_v"]),
        ok=bool(dq <= meta["tolerance_q"] and dv <= meta["tolerance_v"]),
    )


def record(
    fixture: str | Path,
    urdf: str | Path,
    duration: float,
    q0=None,
    v0=None,
    engine_options: dict | None = None,
    hardware: str | Path | None = None,
    freeflyer: bool = False,
    u_table: np.ndarray | None = None,
    name: str | None = None,
    tolerance_q: float = 1e-6,
    tolerance_v: float = 1e-5,
    source: str = "jiminy_tpu-self",
) -> Path:
    """Record a self-fixture from OUR engine (schema smoke-testing; real
    parity fixtures are recorded from the reference binary instead and
    dropped into the same layout)."""
    _force_parity_backend()
    import shutil

    fix = Path(fixture)
    fix.mkdir(parents=True, exist_ok=True)
    shutil.copy(urdf, fix / "robot.urdf")
    if hardware is not None:
        shutil.copy(hardware, fix / "hardware.toml")
    meta = {
        **_PARITY_DEFAULTS,
        "name": name or fix.name,
        "source": source,
        "freeflyer": freeflyer,
        "engine_options": engine_options or {},
        "tolerance_q": tolerance_q,
        "tolerance_v": tolerance_v,
        "duration": float(duration),
    }
    (fix / "meta.json").write_text(json.dumps(meta, indent=2) + "\n")
    sim = _build_sim(fix, meta)
    tree = sim.tree
    dt = float(sim.engine.options.dt)
    q0 = (
        np.asarray(tree.neutral_q(), np.float64)
        if q0 is None
        else np.asarray(q0, np.float64)
    )
    v0 = (
        np.zeros(tree.nv) if v0 is None else np.asarray(v0, np.float64)
    )
    n_steps = int(round(duration / dt))
    q, v = _run_f64(sim, q0, v0, n_steps, u_table)
    t = dt * np.arange(n_steps + 1, dtype=np.float64)
    arrays = {"t": t, "q": q, "v": v}
    if u_table is not None:
        arrays["u"] = np.asarray(u_table, np.float64)
    np.savez(fix / "traj.npz", **arrays)
    return fix


def run_fixtures(pattern: str) -> dict:
    """Compare every fixture matching ``pattern``; return the summary
    (the BASELINE.json correctness metric)."""
    paths = sorted(p for p in glob.glob(pattern) if Path(p).is_dir())
    if not paths:
        raise SystemExit(f"no fixtures match {pattern!r}")
    reports = []
    for p in paths:
        r = compare(p)
        print(r.json(), flush=True)
        reports.append(r)
    summary = {
        "metric": "cross_engine_parity",
        "fixtures": len(reports),
        "passed": sum(r.ok for r in reports),
        "max_drift_q": max(r.max_drift_q for r in reports),
        "max_drift_v": max(r.max_drift_v for r in reports),
        "ok": all(r.ok for r in reports),
    }
    print(json.dumps(summary), flush=True)
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m jiminy_tpu.parity", description=__doc__
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="compare fixtures (glob of dirs)")
    p_run.add_argument("pattern")
    p_rec = sub.add_parser("record", help="record a self-fixture")
    p_rec.add_argument("fixture")
    p_rec.add_argument("urdf")
    p_rec.add_argument("--duration", type=float, default=2.0)
    p_rec.add_argument("--dt", type=float, default=1e-3)
    p_rec.add_argument("--solver", default="runge_kutta_4")
    p_rec.add_argument("--freeflyer", action="store_true")
    args = ap.parse_args(argv)
    if args.cmd == "run":
        ok = run_fixtures(args.pattern)["ok"]
        return 0 if ok else 1
    record(
        args.fixture, args.urdf, args.duration,
        engine_options={"dt": args.dt, "solver": args.solver},
        freeflyer=args.freeflyer,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
