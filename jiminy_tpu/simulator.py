"""Simulator — the single-robot convenience façade.

Reference: ``jiminy_py.Simulator`` — build from URDF (+hardware TOML),
``simulate(t_end, q0, v0)``, seeding, TOML options import/export, log
access and plotting (SURVEY.md §2.3 "Simulator", call stack §3.1).

TPU-first: ``simulate`` compiles the whole run (controller included) into
one XLA program via ``lax.scan``; telemetry comes back as stacked device
arrays and is drained to a TelemetryLog once at the end (§5 telemetry
plan). The same Simulator drives batched runs via ``simulate_batch``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.core import algos
from jiminy_tpu.engine.engine import Engine, EngineOptions, SimState
from jiminy_tpu.robot import Robot, build_robot
from jiminy_tpu.telemetry import TelemetryLog, stack_log


class Simulator:
    """Owns a Robot + Engine; runs simulations and records telemetry."""

    def __init__(
        self,
        robot: Robot,
        options: EngineOptions | None = None,
        ground=None,
        constraints: tuple = (),
        controller: Optional[Callable] = None,
    ):
        self.robot = robot
        self.engine = Engine(
            robot.tree,
            options,
            ground=ground,
            constraints=constraints,
            motors=robot.motors,
            controller=controller,
        )
        self._seed = 0

    # ---- construction ----------------------------------------------------
    @staticmethod
    def build(
        urdf: str | Path,
        hardware: str | Path | dict | None = None,
        freeflyer: bool = False,
        options: EngineOptions | None = None,
        ground=None,
        **kwargs,
    ) -> "Simulator":
        """Build from URDF + hardware description (the reference's
        ``Simulator.build`` entry point)."""
        robot = build_robot(urdf, hardware=hardware, freeflyer=freeflyer)
        return Simulator(robot, options=options, ground=ground, **kwargs)

    @property
    def tree(self):
        return self.robot.tree

    def seed(self, seed: int) -> None:
        self._seed = int(seed)

    # ---- simulation --------------------------------------------------------
    def simulate(
        self,
        t_end: float,
        q0=None,
        v0=None,
        controller: Optional[Callable] = None,
        control_dt: float | None = None,
        log_constants: dict | None = None,
        record_sensors: bool = False,
        seed: int | None = None,
    ) -> tuple[SimState, TelemetryLog]:
        """Run [0, t_end] under ``controller(q, v, t) → command`` sampled at
        ``control_dt`` (default: every engine step). Returns the final
        state and the telemetry log (time, q, v, energy, contact forces,
        and — with ``record_sensors`` — every sensor measurement channel,
        as the reference logs sensor data)."""
        tree = self.tree
        eng = self.engine
        q0 = tree.neutral_q() if q0 is None else jnp.asarray(q0)
        v0 = jnp.zeros(tree.nv) if v0 is None else jnp.asarray(v0)
        control_dt = control_dt or eng.options.dt
        n_sub = max(1, round(control_dt / eng.options.dt))
        n_ctrl = max(1, round(t_end / (n_sub * eng.options.dt)))
        n_cmd = self.robot.nmotors or tree.nv
        suite = self.robot.sensors if record_sensors else None
        if record_sensors and suite is None:
            raise ValueError("record_sensors=True but the robot has none")

        def outer(carry, _):
            st, bufs, key = carry
            u = (
                controller(st.q, st.v, st.t)
                if controller is not None
                else jnp.zeros(n_cmd)
            )
            st = eng.step(st, u, n_substeps=n_sub)
            ke, pe = algos.energy(tree, st.q, st.v)
            rec = {
                "t": st.t,
                "q": st.q,
                "v": st.v,
                "energy_kinetic": ke,
                "energy_potential": pe,
                "contact_force": st.contact_forces,
                "solver_residual": st.solver_residual,
            }
            if suite is not None:
                key, k = jax.random.split(key)
                # accepted-substep acceleration and actuation torque from
                # the engine: IMU accelerometers measure the true proper
                # acceleration, effort sensors the applied torque
                bufs = suite.update(
                    bufs, k, st.q, st.v, st.a, st.contact_forces, st.tau
                )
                for typ, m in suite.read(bufs).items():
                    rec[f"sensor_{typ}"] = m
            return (st, bufs, key), rec

        key0 = jax.random.PRNGKey(self._seed if seed is None else seed)
        st0 = eng.reset(q=q0, v=v0)
        bufs0 = (
            suite.reset(key0, q0, v0) if suite is not None else ()
        )

        @jax.jit
        def run(st, bufs, key):
            return jax.lax.scan(outer, (st, bufs, key), None, length=n_ctrl)

        (final, _, _), rec = run(st0, bufs0, key0)
        jax.block_until_ready(final)

        named = {
            "q": rec["q"],
            "v": rec["v"],
            "energy_kinetic": rec["energy_kinetic"],
            "energy_potential": rec["energy_potential"],
            "solver_residual": rec["solver_residual"],
        }
        if tree.ncp:
            named["contact_force"] = rec["contact_force"]
        if suite is not None:
            for k in rec:
                if k.startswith("sensor_"):
                    named[k] = rec[k]
        from jiminy_tpu.io.serialization import robot_to_json

        constants = {
            "robot_name": self.robot.name,
            "nq": tree.nq,
            "nv": tree.nv,
            "joint_names": ",".join(tree.joint_name),
            "engine_options": str(dataclasses.asdict(eng.options)),
            "seed": self._seed,
            # full robot serialization: a log alone reconstructs the exact
            # setup (reference: build_robot_from_log, SURVEY.md §2.3)
            "robot": robot_to_json(self.robot),
            **(log_constants or {}),
        }
        log = stack_log(np.asarray(rec["t"]), named, constants)
        return final, log

    def simulate_batch(
        self,
        t_end: float,
        q0: jax.Array,  # (B, nq)
        v0: jax.Array,  # (B, nv)
        controller: Optional[Callable] = None,
        control_dt: float | None = None,
    ) -> SimState:
        """Batched rollout (no telemetry): the TPU-native replacement for
        running many engine processes (SURVEY.md §2.6 env batching)."""
        tree = self.tree
        eng = self.engine
        control_dt = control_dt or eng.options.dt
        n_sub = max(1, round(control_dt / eng.options.dt))
        n_ctrl = max(1, round(t_end / (n_sub * eng.options.dt)))
        n_cmd = self.robot.nmotors or tree.nv

        def one(q, v):
            def outer(st, _):
                u = (
                    controller(st.q, st.v, st.t)
                    if controller is not None
                    else jnp.zeros(n_cmd)
                )
                return eng.step(st, u, n_substeps=n_sub), None

            st, _ = jax.lax.scan(outer, eng.reset(q=q, v=v), None, length=n_ctrl)
            return st

        return jax.jit(jax.vmap(one))(q0, v0)

    # ---- render / replay / plot (reference Simulator conveniences) -------
    def render(self, q=None, **kw):
        """Shaded 3-D frame of a configuration (default: neutral) →
        (H, W, 3) uint8 (reference: ``Simulator.render``)."""
        from jiminy_tpu.viewer3d import render_frame3d

        q = self.tree.neutral_q() if q is None else q
        return render_frame3d(
            self.robot, q, ground=self.engine.ground, **kw
        )

    def replay(self, log, path: str | Path, **kw) -> None:
        """Interactive 3-D HTML replay of a telemetry log (reference:
        ``Simulator.replay`` / ``play_trajectories``)."""
        from jiminy_tpu.viewer3d import replay3d_from_log

        kw.setdefault("ground", self.engine.ground)
        kw.setdefault("dt", float(self.engine.options.dt))
        replay3d_from_log(self.robot, log, path, **kw)

    def plot(self, log, path: str | Path | None = None, **kw):
        """Grouped telemetry plots; with ``path`` exports standalone
        HTML (reference: ``Simulator.plot``)."""
        from jiminy_tpu.plot import export_html, plot_log

        if path is not None:
            return export_html(log, path, **kw)
        return plot_log(log, **kw)

    # ---- options io --------------------------------------------------------
    def export_options(self, path: str | Path) -> None:
        """Engine options → TOML (reference: TOML options import/export)."""
        opts = dataclasses.asdict(self.engine.options)
        _write_toml(path, {"engine": opts})

    def import_options(self, path: str | Path) -> None:
        import tomllib

        data = tomllib.loads(Path(path).read_text())
        eng = data.get("engine", {})
        contacts = eng.pop("contacts", None)
        opts = dataclasses.replace(self.engine.options, **eng)
        if contacts is not None:
            from jiminy_tpu.engine.contact import ContactParams

            opts = dataclasses.replace(
                opts,
                contacts=ContactParams(
                    **{k: jnp.float32(val) for k, val in contacts.items()}
                ),
            )
        self.engine = Engine(
            self.tree,
            opts,
            ground=self.engine.ground,
            constraints=self.engine.constraints,
            motors=self.engine.motors,
            controller=self.engine.controller,
        )


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return f'"{v}"'


def _write_toml(path: str | Path, data: dict) -> None:
    """Minimal TOML writer (stdlib has no tomli-w)."""
    lines = []
    for section, values in data.items():
        lines.append(f"[{section}]")
        sub = {}
        for k, v in values.items():
            if isinstance(v, dict):
                sub[k] = v
                continue
            try:
                import jax

                if isinstance(v, (jax.Array, np.ndarray)):
                    v = float(v)
            except Exception:
                pass
            lines.append(f"{k} = {_toml_value(v)}")
        for k, v in sub.items():
            lines.append(f"\n[{section}.{k}]")
            for kk, vv in v.items():
                if isinstance(vv, (jax.Array, np.ndarray)):
                    vv = float(vv)
                lines.append(f"{kk} = {_toml_value(vv)}")
    Path(path).write_text("\n".join(lines) + "\n")
