"""The simulation engine: owns a model + options, advances (t, q, v).

Reference: jiminy's ``Engine`` — start/step/stop, stepper dispatch,
contact resolution, per-period controller/sensor scheduling, external
forces, energy monitoring (SURVEY.md §2.1 "Engine", call stack §3.1).

TPU-first redesign:
- The engine is a *pure function factory*: ``Engine.step`` is a pure
  function (SimState, command, [ground]) → SimState, jit/vmap/shard-able.
  No Python↔C++ round trip per control period — the whole control loop
  lives inside one XLA program (SURVEY.md §1 bottom note).
- Substeps run under ``lax.scan`` with a zero-order-hold command, which is
  the semantics of the reference's ``controllerUpdatePeriod`` breakpoints.
- Randomized per-env grounds are passed as a pytree argument so a single
  compiled program serves heterogeneous terrain across the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType, KinematicTree
from jiminy_tpu.engine import steppers
from jiminy_tpu.engine.contact import ContactParams, compute_contact_fext
from jiminy_tpu.engine.ground import FlatGround


class SimState(struct.PyTreeNode):
    """Device-resident simulation state — one pytree, trivially
    checkpointable (SURVEY.md §5 "Checkpoint/resume")."""

    t: jax.Array  # ()
    q: jax.Array  # (nq,)
    v: jax.Array  # (nv,)
    contact_forces: jax.Array  # (ncp, 3) world frame, last substep


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    """Static engine options (mirror of the reference's option tree names:
    ``stepper.odeSolver``, ``stepper.dtMax``, ``contacts.*`` —
    SURVEY.md §5 "Config/flag system")."""

    solver: str = "euler_symplectic"  # or "runge_kutta_4"
    dt: float = 1e-3  # internal integration step (stepper.dtMax)
    contacts: ContactParams = dataclasses.field(default_factory=ContactParams)
    # joint position bounds as smooth penalty forces (reference models them
    # as constraints or internal spring-damper dynamics; SURVEY.md §2.1
    # "Model": bounds-as-constraints)
    bounds_stiffness: float = 1e4
    bounds_damping: float = 1e2
    enable_bounds: bool = True


class Engine:
    """Builds the pure step function for one robot model.

    ``controller`` (optional) is an *internal dynamics* hook called at every
    substep with (q, v, t) → extra joint torque — the analog of the
    reference's AbstractController internal-dynamics callback
    (SURVEY.md §2.1 "Controllers")."""

    def __init__(
        self,
        tree: KinematicTree,
        options: EngineOptions | None = None,
        ground=None,
        internal_dynamics: Optional[Callable] = None,
    ):
        self.tree = tree
        self.options = options or EngineOptions()
        self.ground = ground if ground is not None else FlatGround()
        self.internal_dynamics = internal_dynamics
        if self.options.solver not in steppers.STEPPERS:
            raise ValueError(f"unknown solver {self.options.solver!r}")
        self._stepper = steppers.STEPPERS[self.options.solver]

    # -- state management ------------------------------------------------
    def reset(
        self, q: jax.Array | None = None, v: jax.Array | None = None
    ) -> SimState:
        tree = self.tree
        return SimState(
            t=jnp.float32(0.0),
            q=tree.neutral_q() if q is None else q,
            v=jnp.zeros(tree.nv) if v is None else v,
            contact_forces=jnp.zeros((tree.ncp, 3)),
        )

    # -- dynamics ----------------------------------------------------------
    def _bound_torques(self, q: jax.Array, v: jax.Array) -> jax.Array:
        """Smooth penalty torque pushing joints back inside their position
        bounds (inactive for quaternion blocks, whose limits are ±1e6)."""
        tree = self.tree
        tau = jnp.zeros(tree.nv, dtype=q.dtype)
        if not self.options.enable_bounds:
            return tau
        ks = self.options.bounds_stiffness
        kd = self.options.bounds_damping
        for i in range(tree.nb):
            if tree.joint_type[i] not in (JointType.REVOLUTE, JointType.PRISMATIC):
                continue
            qo, vo = tree.q_off[i], tree.v_off[i]
            lo, hi = tree.q_min[qo], tree.q_max[qo]
            below = jnp.maximum(lo - q[qo], 0.0)
            above = jnp.maximum(q[qo] - hi, 0.0)
            f = ks * below - ks * above
            active = (below > 0) | (above > 0)
            f = f - jnp.where(active, kd * v[vo], 0.0)
            tau = tau.at[vo].add(f)
        return tau

    def dynamics(
        self,
        q: jax.Array,
        v: jax.Array,
        t: jax.Array,
        u: jax.Array,
        ground,
        fext_user: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Full system dynamics: (q, v, t, joint torque u) → (a, contact
        forces). This is the reference's ``computeSystemsDynamics`` body
        (SURVEY.md §3.1 hot loop)."""
        tree = self.tree
        xw, vel = algos.kinematics(tree, q, v)
        fext, f_contact = compute_contact_fext(
            tree, xw, vel, ground, self.options.contacts
        )
        if fext_user is not None:
            fext = fext + fext_user
        tau = u - tree.damping * v + self._bound_torques(q, v)
        if self.internal_dynamics is not None:
            tau = tau + self.internal_dynamics(q, v, t)
        a = algos.aba(tree, q, v, tau, fext)
        return a, f_contact

    # -- stepping ----------------------------------------------------------
    def step(
        self,
        state: SimState,
        u: jax.Array,
        n_substeps: int = 1,
        ground=None,
        fext_user: jax.Array | None = None,
    ) -> SimState:
        """Advance by ``n_substeps × options.dt`` with zero-order-hold
        command ``u`` (nv,). Pure; jit/vmap-able."""
        ground = ground if ground is not None else self.ground
        dt = self.options.dt
        stepper = self._stepper
        tree = self.tree

        def dyn(q, v, t):
            a, _ = self.dynamics(q, v, t, u, ground, fext_user)
            return a

        def body(carry, _):
            q, v, t = carry
            q, v = stepper(tree, dyn, q, v, t, dt)
            return (q, v, t + dt), None

        (q, v, t), _ = jax.lax.scan(
            body, (state.q, state.v, state.t), None, length=n_substeps
        )
        # refresh contact forces at the accepted state (telemetry/sensors)
        if tree.ncp > 0:
            xw, vel = algos.kinematics(tree, q, v)
            _, f_contact = compute_contact_fext(
                tree, xw, vel, ground, self.options.contacts
            )
        else:
            f_contact = state.contact_forces
        return SimState(t=t, q=q, v=v, contact_forces=f_contact)

    def simulate(
        self,
        state: SimState,
        t_end: float,
        controller: Optional[Callable] = None,
        control_dt: float | None = None,
        ground=None,
    ) -> tuple[SimState, dict]:
        """Run until t_end under ``controller(q, v, t) → u`` updated every
        ``control_dt`` (reference: ``Engine.simulate``, SURVEY.md §3.1).
        Returns final state and a stacked trajectory log (t, q, v)."""
        control_dt = control_dt or self.options.dt
        n_sub = max(1, round(control_dt / self.options.dt))
        n_ctrl = max(1, round(t_end / (n_sub * self.options.dt)))
        nv = self.tree.nv

        def outer(st, _):
            u = (
                controller(st.q, st.v, st.t)
                if controller is not None
                else jnp.zeros(nv)
            )
            st = self.step(st, u, n_substeps=n_sub, ground=ground)
            return st, {"t": st.t, "q": st.q, "v": st.v}

        final, log = jax.lax.scan(outer, state, None, length=n_ctrl)
        return final, log
