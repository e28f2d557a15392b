"""File-based asset workflow: URDF + hardware TOML from data/ (reference
layout — SURVEY.md §1 "Assets")."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]


class TestAssets:
    def test_generated_assets_build_and_simulate(self, tmp_path):
        # regenerate into a temp dir to prove the generator is healthy
        import data.generate_assets as ga

        hw_path = tmp_path / "anymal_hardware.toml"
        from jiminy_tpu.models.quadruped import (
            ANYMAL,
            quadruped_hardware,
            quadruped_urdf,
        )

        (tmp_path / "anymal.urdf").write_text(quadruped_urdf(ANYMAL))
        ga.write_hardware_toml(hw_path, quadruped_hardware(ANYMAL))

        from jiminy_tpu.models.quadruped import stand_q
        from jiminy_tpu.simulator import Simulator

        sim = Simulator.build(
            tmp_path / "anymal.urdf", hw_path, freeflyer=True
        )
        assert sim.robot.nmotors == 12
        assert sim.tree.ncp == 4
        import pytest

        # TOML armature applied (float32 storage)
        assert float(sim.tree.armature[6]) == pytest.approx(0.07)
        final, log = sim.simulate(0.05, q0=jnp.asarray(stand_q(sim.tree)))
        assert len(log) == 50
        assert bool(jnp.all(jnp.isfinite(final.q)))

    def test_checked_in_assets_parse(self):
        from jiminy_tpu.robot import build_robot

        for name, nm in (("anymal", 12), ("spotmicro", 12), ("atlas", 23)):
            urdf = REPO / "data" / f"{name}.urdf"
            hw = REPO / "data" / f"{name}_hardware.toml"
            assert urdf.exists() and hw.exists()
            robot = build_robot(urdf, hw, freeflyer=True)
            assert robot.nmotors == nm
