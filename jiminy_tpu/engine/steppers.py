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


def integrate_adaptive(
    tree: KinematicTree,
    dyn: DynFn,
    q: jax.Array,
    v: jax.Array,
    t0,
    t_end,
    dt_init: float = 1e-3,
    dt_max: float = 0.02,
    dt_min: float = 1e-7,
    tol_abs: float = 1e-8,
    tol_rel: float = 1e-6,
    max_steps: int = 100_000,
) -> tuple[jax.Array, jax.Array, jax.Array, dict]:
    """Adaptive DOPRI-5(4) integration to ``t_end`` with the PI step-size
    controller — the reference's default ``runge_kutta_dopri`` stepper
    with ``tolAbs/tolRel/dtMax`` semantics (SURVEY.md §2.1 "Steppers").

    Runs a ``lax.while_loop`` (data-dependent step count), so it serves
    the single-robot accuracy path, not the vmapped SPMD product path
    (SURVEY.md §7 hard-parts "Adaptive stepping is anti-TPU").
    Returns (t, q, v, stats) with accept/reject counters — the reference
    telemeters the same stepper statistics."""
    # PI controller exponents for a 5(4) embedded pair (Hairer PI4.2:
    # dt' = dt·S·ratio^-0.7/p·ratio_prev^0.4/p)
    k_i, k_p = 0.7 / 5.0, 0.4 / 5.0
    safety = 0.9

    def scale(q, v, dq, dv):
        m = jnp.maximum(
            jnp.max(jnp.abs(v)), jnp.maximum(jnp.max(jnp.abs(dv)), 1.0)
        )
        return tol_abs + tol_rel * m

    def cond(carry):
        t, q, v, dt, err_prev, n_acc, n_rej, n = carry
        return (t < t_end) & (n < max_steps)

    def body(carry):
        t, q, v, dt, err_prev, n_acc, n_rej, n = carry
        dt = jnp.minimum(dt, t_end - t)
        q2, v2, err = runge_kutta_dopri5(tree, dyn, q, v, t, dt)
        tol = scale(q, v, q2, v2)
        ratio = err / tol
        accept = ratio <= 1.0
        # PI controller: dt' = dt·S·ratio^-ki·(err_prev/tol)^kp
        fac = safety * jnp.power(
            jnp.maximum(ratio, 1e-10), -k_i
        ) * jnp.power(jnp.maximum(err_prev, 1e-10), k_p)
        fac = jnp.clip(fac, 0.2, 5.0)
        dt_next = jnp.clip(dt * fac, dt_min, dt_max)
        t = jnp.where(accept, t + dt, t)
        q = jnp.where(accept, q2, q)
        v = jnp.where(accept, v2, v)
        err_prev = jnp.where(accept, jnp.maximum(ratio, 1e-10), err_prev)
        return (
            t, q, v, dt_next, err_prev,
            n_acc + accept.astype(jnp.int32),
            n_rej + (~accept).astype(jnp.int32),
            n + 1,
        )

    t0 = jnp.asarray(t0, q.dtype)
    t_end = jnp.asarray(t_end, q.dtype)
    carry = (
        t0, q, v, jnp.asarray(dt_init, q.dtype), jnp.asarray(1.0, q.dtype),
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    t, q, v, _dt, _e, n_acc, n_rej, n = jax.lax.while_loop(cond, body, carry)
    return t, q, v, {"accepted": n_acc, "rejected": n_rej, "iters": n}


STEPPERS = {
    "euler_symplectic": euler_semi_implicit,
    "euler_explicit": euler_semi_implicit,  # reference option name alias
    "runge_kutta_4": runge_kutta_4,
}
