"""Fixed-step ODE integrators on the configuration Lie group.

Reference: jiminy's stepper family — ``euler_explicit`` (semi-implicit),
``runge_kutta_4``, ``runge_kutta_dopri`` (adaptive) — integrating q via
``pinocchio::integrate`` (SURVEY.md §2.1 "Steppers").

TPU-first: adaptive per-env time steps break SPMD lockstep, so the product
path is fixed-step semi-implicit Euler (the BASELINE.json north star);
``runge_kutta_4`` is provided for parity testing, and ``runge_kutta_dopri``
with a PI controller exists for single-env high-accuracy runs where the
step loop uses masked acceptance under a fixed substep budget
(SURVEY.md §7 hard-parts "Adaptive stepping is anti-TPU").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import KinematicTree

# dyn(q, v, t) -> acceleration (nv,)
DynFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def euler_semi_implicit(
    tree: KinematicTree, dyn: DynFn, q: jax.Array, v: jax.Array, t, dt
) -> tuple[jax.Array, jax.Array]:
    """Symplectic (semi-implicit) Euler: v ← v + a·dt, then q ← q ⊕ v·dt.

    Matches the reference's ``euler_explicit`` stepper semantics (which
    updates velocity first), and is the throughput path."""
    a = dyn(q, v, t)
    v_next = v + a * dt
    q_next = algos.integrate(tree, q, v_next, dt)
    return q_next, v_next


def runge_kutta_4(
    tree: KinematicTree, dyn: DynFn, q: jax.Array, v: jax.Array, t, dt
) -> tuple[jax.Array, jax.Array]:
    """Classic RK4 adapted to the manifold: position stages are tangent
    increments applied to the base configuration via ``integrate``."""
    half = 0.5 * dt
    k1q = v
    k1v = dyn(q, v, t)
    q2 = algos.integrate(tree, q, k1q, half)
    k2q = v + half * k1v
    k2v = dyn(q2, k2q, t + half)
    q3 = algos.integrate(tree, q, k2q, half)
    k3q = v + half * k2v
    k3v = dyn(q3, k3q, t + half)
    q4 = algos.integrate(tree, q, k3q, dt)
    k4q = v + dt * k3v
    k4v = dyn(q4, k4q, t + dt)
    dq = (k1q + 2.0 * k2q + 2.0 * k3q + k4q) / 6.0
    dv = (k1v + 2.0 * k2v + 2.0 * k3v + k4v) / 6.0
    return algos.integrate(tree, q, dq, dt), v + dt * dv


# Dormand-Prince 5(4) Butcher tableau (same coefficients as the reference's
# runge_kutta_dopri stepper / boost-odeint dopri5).
_DOPRI_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DOPRI_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DOPRI_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)


def runge_kutta_dopri5(
    tree: KinematicTree, dyn: DynFn, q: jax.Array, v: jax.Array, t, dt
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fixed DOPRI-5 step. Returns (q', v', err_norm) where err_norm is
    the embedded 4th/5th-order error estimate (max-abs over the state) —
    consumable by an outer PI controller for accuracy monitoring."""
    kq = []
    kv = []
    for s in range(7):
        dq_s = sum((a * kqi for a, kqi in zip(_DOPRI_A[s], kq)), jnp.zeros_like(v))
        dv_s = sum((a * kvi for a, kvi in zip(_DOPRI_A[s], kv)), jnp.zeros_like(v))
        q_s = algos.integrate(tree, q, dq_s, dt)
        v_s = v + dt * dv_s
        kq.append(v_s)
        kv.append(dyn(q_s, v_s, t + _DOPRI_C[s] * dt))
    dq5 = sum(b * k for b, k in zip(_DOPRI_B5, kq))
    dv5 = sum(b * k for b, k in zip(_DOPRI_B5, kv))
    dq4 = sum(b * k for b, k in zip(_DOPRI_B4, kq))
    dv4 = sum(b * k for b, k in zip(_DOPRI_B4, kv))
    q_next = algos.integrate(tree, q, dq5, dt)
    v_next = v + dt * dv5
    err = jnp.maximum(
        jnp.max(jnp.abs(dq5 - dq4)) * dt, jnp.max(jnp.abs(dv5 - dv4)) * dt
    )
    return q_next, v_next, err


STEPPERS = {
    "euler_symplectic": euler_semi_implicit,
    "euler_explicit": euler_semi_implicit,  # reference option name alias
    "runge_kutta_4": runge_kutta_4,
}
