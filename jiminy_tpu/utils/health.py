"""Numerical-health tooling — the sanitizer/debug-assertion analog.

The reference ships C++ sanitizer builds and debug assertions
(SURVEY.md §5 "Sanitizer analog": the TPU plan is a
``checkify``/``debug_nans`` harness). Three tiers, cheapest first:

1. ``is_bad_state`` / ``state_flags`` — O(state) elementwise checks,
   cheap enough to run EVERY step. ``BaseEnv`` calls ``is_bad_state``
   each step (``nan_guard=True`` default): a non-finite or exploding
   state terminates the episode and zeroes its reward/observation, so
   one blown-up env resets instead of poisoning the whole batch through
   auto-reset (VERDICT r1 weak #7).
2. ``checkify_fn`` — wrap any jitted step in
   ``jax.experimental.checkify`` user checks: returns (error, out);
   ``error.throw()`` raises with the offending check's message. Debug
   tier: run when tier 1 flags something and you need to know WHERE.
3. ``debug_nans`` — context manager enabling ``jax_debug_nans`` so XLA
   re-runs the offending primitive un-jitted and raises at the exact op.
   CPU-repro tier (eager re-execution through the axon TPU tunnel would
   be pathologically slow — reproduce on CPU).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

# bitmask values returned by state_flags
NONFINITE_Q = 1
NONFINITE_V = 2
VEL_EXPLOSION = 4
RESIDUAL_BLOWUP = 8


def state_flags(sim, vel_limit: float = 1e4, residual_limit: float = 1e6):
    """int32 bitmask of health violations for one SimState (jit/vmap-able).

    ``vel_limit`` catches pre-NaN explosions (a diverging PGS/stepper
    usually passes through huge-but-finite velocities first);
    ``residual_limit`` flags solver breakdown."""
    bad_q = ~jnp.all(jnp.isfinite(sim.q))
    bad_v = ~jnp.all(jnp.isfinite(sim.v))
    huge_v = jnp.any(jnp.abs(sim.v) > vel_limit)
    bad_res = ~jnp.isfinite(sim.solver_residual) | (
        sim.solver_residual > residual_limit
    )
    return (
        jnp.int32(NONFINITE_Q) * bad_q
        + jnp.int32(NONFINITE_V) * bad_v
        + jnp.int32(VEL_EXPLOSION) * huge_v
        + jnp.int32(RESIDUAL_BLOWUP) * bad_res
    )


def is_bad_state(sim, vel_limit: float = 1e4) -> jax.Array:
    """() bool — state is non-finite or exploding; see state_flags."""
    return state_flags(sim, vel_limit=vel_limit) != 0


def checkify_fn(fn, vel_limit: float = 1e4):
    """Wrap ``fn`` with jax.experimental.checkify user checks on every
    SimState found in its output pytree. Returns ``(args...) -> (error,
    out)``; call ``error.throw()`` host-side (raises ValueError naming
    the failed check). Composes with jit; under vmap errors aggregate.

    >>> checked = health.checkify_fn(lambda s: env.step(s, a))
    >>> err, st = jax.jit(checked)(st)
    >>> err.throw()   # no-op when healthy
    """
    from jax.experimental import checkify

    from jiminy_tpu.engine.engine import SimState

    def with_checks(*args, **kwargs):
        out = fn(*args, **kwargs)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            out, is_leaf=lambda x: isinstance(x, SimState)
        ):
            if not isinstance(leaf, SimState):
                continue
            where = jax.tree_util.keystr(path) or "<result>"
            checkify.check(
                jnp.all(jnp.isfinite(leaf.q)), f"non-finite q at {where}"
            )
            checkify.check(
                jnp.all(jnp.isfinite(leaf.v)), f"non-finite v at {where}"
            )
            checkify.check(
                jnp.all(jnp.abs(leaf.v) <= vel_limit),
                f"velocity explosion (>|{vel_limit}|) at {where}",
            )
        return out

    return checkify.checkify(with_checks, errors=checkify.user_checks)


@contextmanager
def debug_nans(enable: bool = True):
    """Enable ``jax_debug_nans`` inside the block: any NaN produced under
    jit re-runs op-by-op and raises at the producing primitive. Use on
    CPU repros (see module docstring)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
