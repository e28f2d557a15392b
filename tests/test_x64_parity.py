"""Parity-mode (float64) tests — the reference engine is f64; fixed-seed
trajectory parity requires running our algorithms in x64
(SURVEY.md §7 hard-parts: "parity mode runs f64 + RK4")."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jiminy_tpu.models.toys import make_pendulum, make_double_pendulum
from jiminy_tpu.core import algos

# f64 end-to-end: ABA/RNEA consistency at f64 precision
tree = make_double_pendulum()
q = jnp.array([0.7, -0.4], jnp.float64)
v = jnp.array([0.2, 1.0], jnp.float64)
tau = jnp.array([0.1, -0.3], jnp.float64)
a = algos.aba(tree, q, v, tau)
tau2 = algos.rnea(tree, q, v, a)
err = float(jnp.max(jnp.abs(tau - tau2)))
assert err < 1e-10, err   # f64-grade consistency (f32 gives ~1e-6)
assert a.dtype == jnp.float64

# RK4 f64 energy conservation at reference-grade tolerance
p = make_pendulum()
from jiminy_tpu.engine.steppers import runge_kutta_4
q = jnp.array([1.2], jnp.float64); vv = jnp.zeros(1, jnp.float64)
def dyn(q, v, t):
    return algos.aba(p, q, v, jnp.zeros(1, jnp.float64))
ke0, pe0 = algos.energy(p, q, vv)
for _ in range(2000):
    q, vv = runge_kutta_4(p, dyn, q, vv, 0.0, 1e-3)
ke1, pe1 = algos.energy(p, q, vv)
drift = abs(float((ke1 + pe1) - (ke0 + pe0)))
assert drift < 1e-9, drift
print("X64_PARITY_OK", err, drift)
"""


@pytest.mark.slow
def test_f64_parity_mode():
    """Run in a subprocess (x64 is a global config)."""
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "X64_PARITY_OK" in r.stdout
