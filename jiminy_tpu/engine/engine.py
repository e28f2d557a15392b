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
from jiminy_tpu.engine import constraints as cstr
from jiminy_tpu.engine import steppers
from jiminy_tpu.engine.contact import (
    ContactParams,
    compute_contact_fext,
    surface_contacts,
)
from jiminy_tpu.engine.forces import compute_forces as compute_registered_forces
from jiminy_tpu.engine.ground import FlatGround
from jiminy_tpu.engine.solver import BlockSpec, pgs_solve, pgs_solve_grouped
from jiminy_tpu.math import linalg


class SimState(struct.PyTreeNode):
    """Device-resident simulation state — one pytree, trivially
    checkpointable (SURVEY.md §5 "Checkpoint/resume")."""

    t: jax.Array  # ()
    q: jax.Array  # (nq,)
    v: jax.Array  # (nv,)
    contact_forces: jax.Array  # (ncp, 3) world frame, last substep
    # max PGS residual of the last substep — the reference telemeters
    # stepper/solver health; fixed-iteration PGS monitors convergence
    # this way (SURVEY.md §7 hard-parts)
    solver_residual: jax.Array = None  # ()
    # constraint impulses of the last substep (warm start for the next —
    # contacts/bounds change slowly between substeps, so warm-started PGS
    # converges in fewer sweeps)
    lam: jax.Array = None  # (nc,)
    # accepted generalized acceleration and actuation torque of the LAST
    # substep — what IMU accelerometers and effort sensors measure
    # (reference: sensors read the engine's accepted a/u, SURVEY.md §2.1
    # "Sensors"; VERDICT r1 weak #1)
    a: jax.Array = None  # (nv,)
    tau: jax.Array = None  # (nv,)


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    """Static engine options (mirror of the reference's option tree names:
    ``stepper.odeSolver``, ``stepper.dtMax``, ``contacts.*`` —
    SURVEY.md §5 "Config/flag system")."""

    solver: str = "euler_symplectic"  # or "runge_kutta_4"
    dt: float = 1e-3  # internal integration step (stepper.dtMax)
    contacts: ContactParams = dataclasses.field(default_factory=ContactParams)
    # contact model selector, as in the reference's ``contacts.model``
    # option: "spring_damper" (penalty) or "constraint" (PGS impulses)
    contact_model: str = "spring_damper"
    # PGS solver options (reference: ``constraints.*`` option block)
    pgs_iters: int = 16
    pgs_relax: float = 1.0
    pgs_reg: float = 1e-6
    contact_baumgarte_freq: float = 20.0
    # cap on the Baumgarte position-correction velocity (m/s) and
    # penetration slop (m): prevents the stabilization from *launching*
    # bodies after deep impacts (Baumgarte bounce) while still removing
    # steady-state penetration down to the slop
    contact_max_correction_vel: float = 0.2
    contact_slop: float = 1e-3
    # constraint-contact activation margin (m): rows activate at
    # depth > −margin with a velocity-barrier target depth/dt (the point
    # may approach the surface this substep but not cross it) instead of
    # a hard depth > 0 flip. Continuous activation — without it, f32
    # noise between backends near grazing contact flips the active set
    # and injects O(1) impulse differences (measured: the whole-substep
    # kernel on real TPU vs XLA differed by up to 65 rad/s after one env
    # step at touchdown states, traced to exactly this knife edge; the
    # reference smooths the same edge via transitionEps,
    # SURVEY.md §2.1 "Contact model"). Also absorbs impacts at the
    # velocity level up to one substep early instead of via a
    # penetration spike.
    contact_margin: float = 5e-3
    # dense-solve backend for the impulse path:
    #   "pallas" — the batch-lane VMEM-resident kernel in
    #     ops/constraint_solve.py, engaged under vmap via custom_vmap.
    #     1.7× END-TO-END on TPU (1.76M vs 1.03M ANYmal env-steps/s: one
    #     kernel replaces dozens of small XLA ops + their HBM round
    #     trips per substep — docs/tpu_performance.md).
    #   "xla" — fused column-vectorized chain (fastest on CPU; also the
    #     f64 parity path).
    #   "auto" (default) — "pallas" on TPU, "xla" elsewhere.
    constraint_solver: str = "auto"
    # joint position bounds: "penalty" (spring-damper torque), "constraint"
    # (PGS rows — the reference's bounds-as-constraints, SURVEY.md §2.1
    # "Model"), or "auto" (constraint on the impulse path, else penalty)
    bounds_model: str = "auto"
    bounds_baumgarte_freq: float = 20.0
    # compute the per-substep KKT residual (solver-health telemetry, the
    # reference's stepper stats); ~5% substep cost — envs that don't
    # consume it can disable
    compute_solver_residual: bool = True
    # joint position bounds as smooth penalty forces (reference models them
    # as constraints or internal spring-damper dynamics; SURVEY.md §2.1
    # "Model": bounds-as-constraints)
    bounds_stiffness: float = 1e4
    bounds_damping: float = 1e2
    enable_bounds: bool = True
    # multi-substep persistence: fuse ALL n_substeps of a step() into ONE
    # whole-substep kernel launch, (q, v, λ) VMEM-resident, actuation
    # torque recomputed in-kernel (requires the substep kernel in scope
    # AND a declarative torque path: PDController / direct motor command).
    # Default ON: validated on TPU v5e hardware 2026-08-19
    # (benchmarks/fusion_validate.py — fused-vs-unfused dq=0, dv=7e-9 on
    # device; trained-ANYmal eval identical to 6 decimals, 0% falls;
    # throughput 6.72M vs 6.08M env-steps/s). Out-of-scope configs
    # (opaque controller closures, user fext, contact-param overrides)
    # silently fall back to per-substep launches in step().
    substep_fusion: bool = True


def _kernel_custom_vmap(call_batched, n_out: int):
    """custom_vmap wrapper around a batched kernel entry point:
    unbatched calls get a singleton batch dim; the vmap rule broadcasts
    any unbatched args and calls the batched form directly (one kernel
    launch for the whole batch). Shared by the single-substep and
    multi-substep builders for every ground/wrench arity."""

    @jax.custom_batching.custom_vmap
    def fn(*args):
        out = call_batched(*(a[None] for a in args))
        return tuple(o[0] for o in out)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = list(args)
        for i, (a, b) in enumerate(zip(args, in_batched)):
            if not b:
                args[i] = jnp.broadcast_to(a[None], (axis_size, *a.shape))
        return call_batched(*args), (True,) * n_out

    return fn


class PDController:
    """Declarative inner-loop PD controller: motor command =
    ``kp·(target − q_motor) − kd·v_motor``, evaluated at EVERY physics
    substep against the zero-order-hold env action (reference: the
    gym_jiminy PDController block running between env steps,
    SURVEY.md §2.4 "Blocks", §3.2).

    Engines accept either an opaque ``(cmd, q, v, t) → u`` closure or
    this declarative form. Only the declarative form can be baked into
    the multi-substep Pallas kernel (a closure cannot be introspected),
    so shipped envs should prefer it. ``kp``/``kd`` are scalars or
    (nmotors,) arrays."""

    def __init__(self, kp, kd):
        self.kp = kp
        self.kd = kd

    def bind(self, motors) -> Callable:
        """The equivalent plain callable for the XLA/per-substep paths."""
        kp = jnp.asarray(self.kp)
        kd = jnp.asarray(self.kd)

        def fn(cmd, q, v, t):
            qm, vm = motors.joint_state(q, v)
            return kp * (cmd - qm) - kd * vm

        return fn


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
        constraints: tuple = (),
        motors=None,
        controller: Optional[Callable] = None,
        forces: tuple = (),
        collision_pairs: tuple = (),
    ):
        self.tree = tree
        self.options = options or EngineOptions()
        self.ground = ground if ground is not None else FlatGround()
        self.internal_dynamics = internal_dynamics
        self.constraints = tuple(constraints)
        # declared body-body / self-collision primitive pairs
        # (engine/collision.py — reference: hpp-fcl collision pairs,
        # SURVEY.md §2.1 "Model"). Static pair list → static narrow
        # phase; rides ALL backends including the whole-substep kernel
        # (in-kernel narrow phase since round 5).
        self.collision_pairs = tuple(collision_pairs)
        if self.collision_pairs and self.options.contact_model != "constraint":
            raise ValueError(
                "collision_pairs require contact_model='constraint' "
                "(pair impulses resolve in the PGS)"
            )
        # static per-contact tangential effective mass: bounds the
        # penalty-path friction slope (contact.penalty_forces stability
        # clamp); build-time numpy, baked into the trace as constants
        from jiminy_tpu.engine.contact import contact_effective_mass

        self._contact_m_eff = (
            contact_effective_mass(tree) if tree.ncp else None
        )
        # registered external forces: impulses, profiles, couplings
        # (reference: registerImpulseForce/ProfileForce/ForceCoupling)
        self.forces = tuple(forces)
        # optional motor bank: when set, ``step``'s command is motor-side
        # (nm,) and is mapped to joint torque per substep (reference:
        # Robot = Model + hardware, SURVEY.md §2.1 "Robot"/"Motors")
        self.motors = motors
        # optional inner-loop controller (cmd, q, v, t) → motor command,
        # evaluated at every substep — the reference's high-frequency
        # controller running at controllerUpdatePeriod inside Engine.step
        # with the env action as its setpoint (SURVEY.md §3.1/§3.2).
        # A declarative PDController is bound to the motors here and kept
        # for the multi-substep kernel's in-kernel torque path.
        self.pd_controller = None
        if isinstance(controller, PDController):
            if motors is None:
                raise ValueError("PDController requires motors")
            self.pd_controller = controller
            controller = controller.bind(motors)
        self.controller = controller
        self._rebuild()

    def _rebuild(self) -> None:
        """(Re)derive every option-dependent member — stepper, solver
        backend and the baked whole-substep kernel. Called from __init__
        and set_options so mutated options can never leave a stale
        kernel behind (the substep kernel bakes dt/pgs_iters/friction
        into its SubstepSpec)."""
        if self.options.solver not in steppers.STEPPERS:
            raise ValueError(f"unknown solver {self.options.solver!r}")
        if self.options.constraint_solver not in (
            "auto", "xla", "pallas", "pallas_substep"
        ):
            raise ValueError(
                f"unknown constraint_solver "
                f"{self.options.constraint_solver!r}"
            )
        self._bounded_cache_ = None
        self._pair_set = None
        if self.collision_pairs:
            from jiminy_tpu.engine.collision import CollisionPairSet

            self._pair_set = CollisionPairSet(
                self.tree,
                self.collision_pairs,
                float(self.options.contacts.friction),
            )
        self._solver_backend = self.options.constraint_solver
        if self._solver_backend == "auto":
            self._solver_backend = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        self._stepper = steppers.STEPPERS[self.options.solver]
        # constraint/impulse path: PGS at the velocity level fused with a
        # semi-implicit Euler step (SURVEY.md §2.7 item 2)
        self._use_impulse = (
            bool(self.constraints) or self.options.contact_model == "constraint"
        )
        if self._use_impulse and self.options.solver not in (
            "euler_symplectic",
            "euler_explicit",
        ):
            raise ValueError(
                "constraint/impulse dynamics requires the euler_symplectic "
                "stepper (velocity-level impulses)"
            )
        self._substep_fn = None
        self._substep_fourier = False
        self._substep_gmode = "flat"
        self._substep_spec = None
        self._multi_substep_fns = {}
        # randomized-kernel variant (per-env model params as a traced
        # lane input): built lazily on the first step(model_params=...)
        self._substep_fn_rand = None
        self._substep_spec_rand = None
        self._rand_checked = False
        # in-kernel sensor variants (per suite/schedule, lazy)
        self._sensor_specs = {}
        self._sensor_multi_fns = {}
        if self._solver_backend == "pallas_substep":
            # explicit request: unsupported configs fail loudly
            self._substep_fn = self._build_substep_kernel()
            self._solver_backend = "pallas"  # fallback for gated calls
        elif (
            self.options.constraint_solver == "auto"
            and self._solver_backend == "pallas"
            and self._use_impulse
            # closed-loop robots (DistanceConstraint equality rows) ride
            # this kernel too since round 3: the r1/r2 "kernel eval gap"
            # was the bf16-matmul corruption of the vmapped XLA/chain
            # paths on TPU (algos.f32_matmul) plus the contact-
            # activation knife edge (EngineOptions.contact_margin), not
            # a kernel defect — post-fix the backends agree to 1e-4
            # over 10 Cassie substeps on the real chip
            # (docs/tpu_performance.md "Closed-loop numerics")
        ):
            # auto on TPU: whole-substep kernel when the config is in
            # scope (flat ground, euler, no flex), else the chain
            # kernel — both validated against the XLA path
            try:
                self._substep_fn = self._build_substep_kernel()
            except ValueError:
                pass

    def _build_substep_kernel(self, randomized: bool = False):
        """Whole-substep Pallas kernel (ops/substep_kernel.py): validates
        the engine config is inside the kernel's scope and returns a
        custom_vmap'd (q, v, tau, lam0) → (q⁺, v⁺, λ, residual).
        ``randomized=True`` builds the variant taking a packed per-env
        model-parameter vector as its last input (domain randomization
        at kernel speed — engine/randomization.py)."""
        from jiminy_tpu.engine.ground import (
            FlatGround,
            FourierGround,
            PerlinGround,
            StairsGround,
        )
        from jiminy_tpu.ops.constraint_solve import SolveConfig
        from jiminy_tpu.ops.substep_kernel import (
            SubstepSpec,
            substep_batched_pallas,
        )

        from jiminy_tpu.engine.constraints import DistanceConstraint

        opts, tree = self.options, self.tree
        bad = []
        if opts.solver not in ("euler_symplectic", "euler_explicit"):
            bad.append("stepper must be euler_symplectic")
        if opts.contact_model != "constraint":
            bad.append("contact_model must be 'constraint'")
        if not isinstance(
            self.ground,
            (FlatGround, FourierGround, PerlinGround, StairsGround),
        ):
            bad.append(
                "ground must be FlatGround, FourierGround, PerlinGround "
                "or StairsGround"
            )
        if self.forces:
            bad.append("registered forces unsupported")
        if (
            self._pair_set is not None
            and self._pair_set.total_contacts > 24
        ):
            bad.append(
                "pair contact count too large for in-kernel assembly "
                f"({self._pair_set.total_contacts} > 24 — e.g. large "
                "mesh support clouds) — auto falls back to the "
                "solve-chain kernel / XLA"
            )
        if any(
            not isinstance(c, DistanceConstraint) for c in self.constraints
        ):
            bad.append(
                "only DistanceConstraints supported (Cassie pushrods)"
            )
        if any(
            tree.joint_type[i]
            not in (
                JointType.FREE,
                JointType.REVOLUTE,
                JointType.PRISMATIC,
                JointType.SPHERICAL,
            )
            for i in range(tree.nb)
        ):
            bad.append("unsupported joint type in tree")
        if self._bounds_mode() != "constraint" or not opts.enable_bounds:
            bad.append("bounds must run as constraints")
        if bad:
            raise ValueError(
                "constraint_solver='pallas_substep' unsupported here: "
                + "; ".join(bad)
            )
        bj = self._bounded_joints()
        ncp = tree.ncp
        color_order = list(range(0, ncp, 2)) + list(range(1, ncp, 2))
        n0 = len(range(0, ncp, 2))
        n_eq = sum(c.size for c in self.constraints)
        off = n_eq + len(bj)
        colors = list(
            ((off, n0), (off + 3 * n0, ncp - n0)) if ncp else ()
        )
        # declared collision pairs: [t1,t2,n] blocks appended after the
        # ground rows; each PAIR spans one color over its contact patch
        # (pairs may share bodies — sequential Gauss-Seidel between
        # colors), mirroring the XLA path's layout in _impulse_substep
        n_pair_contacts = 0
        if self._pair_set is not None:
            pair_off = off + 3 * ncp
            for k_i in self._pair_set.contacts_per_pair:
                colors.append((pair_off, k_i))
                pair_off += 3 * k_i
            n_pair_contacts = self._pair_set.total_contacts
        cfg = SolveConfig(
            n=tree.nv,
            nc=off + 3 * ncp + 3 * n_pair_contacts,
            dt=float(opts.dt),
            eq_blocks=tuple(
                BlockSpec("equality", i, 1) for i in range(n_eq)
            ),
            bounds_span=(n_eq, len(bj)) if bj else None,
            contact_colors=tuple(colors),
            iters=opts.pgs_iters,
            relax=opts.pgs_relax,
            reg=opts.pgs_reg,
            compute_residual=opts.compute_solver_residual,
        )
        fourier = isinstance(self.ground, FourierGround)
        stairs = isinstance(self.ground, StairsGround)
        perlin = isinstance(self.ground, PerlinGround)
        gmode = (
            "fourier" if fourier
            else "stairs" if stairs
            else "perlin" if perlin
            else "flat"
        )
        spec = SubstepSpec(
            tree, opts, cfg, bj, color_order,
            float(self.ground.height) if gmode == "flat" else 0.0,
            float(opts.contacts.friction),
            dist_constraints=self.constraints,
            ground_mode=gmode,
            # n_fourier doubles as the static octave count for perlin
            n_fourier=(
                self.ground.n_terms if fourier
                else self.ground.octaves if perlin
                else 0
            ),
            torque=self._build_torque_spec(),
            # wrench input is always on: zero-cost when fed zeros, and it
            # keeps push-disturbance training (base_wrench) on this path
            base_wrench=True,
            pairs=self._pair_set,
            randomized=randomized,
        )
        if not randomized:
            self._substep_gmode = gmode
            self._substep_fourier = fourier  # kept for tests/back-compat
            self._substep_spec = spec
        else:
            self._substep_spec_rand = spec

        # per-env terrain rides a traced coefficient argument (vmapped
        # callers pass per-env coefficients — reference: random ground
        # per reset, SURVEY.md §2.4); the wrench input is next, then the
        # optional packed model-parameter vector for randomized variants
        if spec.n_gc:
            if randomized:
                call = lambda q, v, tau, lam0, gc, w0, mp: (
                    substep_batched_pallas(
                        spec, q, v, tau, lam0, gc, w0, mp=mp
                    )
                )
            else:
                call = lambda q, v, tau, lam0, gc, w0: (
                    substep_batched_pallas(spec, q, v, tau, lam0, gc, w0)
                )
        else:
            if randomized:
                call = lambda q, v, tau, lam0, w0, mp: (
                    substep_batched_pallas(
                        spec, q, v, tau, lam0, wrench=w0, mp=mp
                    )
                )
            else:
                call = lambda q, v, tau, lam0, w0: (
                    substep_batched_pallas(spec, q, v, tau, lam0, wrench=w0)
                )
        return _kernel_custom_vmap(call, 5)

    def _get_rand_substep_fn(self):
        """Randomized-kernel variant (built lazily, cached). None when
        the nominal kernel is out of scope — callers fall back to the
        XLA path exactly as before."""
        if not self._rand_checked:
            self._rand_checked = True
            if self._substep_fn is not None:
                self._substep_fn_rand = self._build_substep_kernel(
                    randomized=True
                )
        return self._substep_fn_rand

    def _pack_model_params(self, model_params) -> jax.Array:
        """ModelParams → the (n_mp,) packed lane input of the randomized
        kernel: PERTURBED mass ‖ h ‖ I_sym ‖ armature [‖ motor gain ‖
        friction scale] (layout: ops/substep_kernel._unpack_mp). Applied
        per env step on the host XLA side — cheap (tiny (nb,3,3) math)
        and amortized over all fused substeps."""
        t2 = model_params.apply_to_tree(self.tree)
        I = t2.inertia_mat
        I6 = jnp.stack(
            [I[:, 0, 0], I[:, 1, 1], I[:, 2, 2],
             I[:, 0, 1], I[:, 0, 2], I[:, 1, 2]],
            axis=-1,
        )
        parts = [
            t2.inertia_mass,
            t2.inertia_h.reshape(-1),
            I6.reshape(-1),
            t2.armature,
        ]
        if self._substep_spec.torque is not None:
            parts += [
                model_params.motor_gain,
                model_params.motor_friction_scale,
            ]
        return jnp.concatenate(
            [jnp.asarray(p, jnp.float32) for p in parts]
        )

    def _kernel_ground_ok(self, ground) -> bool:
        """Is ``ground`` servable by the built substep kernel? Flat
        grounds must be THE engine's ground (height is baked into the
        spec); Fourier grounds only need a matching term count — the
        coefficients are a traced kernel input, so per-env randomized
        terrains (vmapped pytree leaves) stay on the fast path."""
        from jiminy_tpu.engine.ground import FourierGround

        if self._substep_gmode == "fourier":
            return (
                isinstance(ground, FourierGround)
                and ground.amp.ndim == 1
                and ground.n_terms == self.ground.n_terms
            )
        if self._substep_gmode == "stairs":
            from jiminy_tpu.engine.ground import StairsGround

            return (
                isinstance(ground, StairsGround)
                and ground.step_width.ndim == 0
            )
        if self._substep_gmode == "perlin":
            from jiminy_tpu.engine.ground import PerlinGround

            return (
                isinstance(ground, PerlinGround)
                and ground.seed.ndim == 0
                and ground.octaves == self.ground.octaves
            )
        return ground is self.ground

    def _ground_coef(self, ground) -> jax.Array:
        """Per-env ground-coefficient vector for the kernel's gc input
        (mirrors ops/substep_kernel._ground_query's layout)."""
        if self._substep_gmode == "fourier":
            return jnp.concatenate(
                [ground.amp, ground.kx, ground.ky, ground.phase]
            )
        if self._substep_gmode == "perlin":
            return jnp.stack([ground.seed, ground.freq, ground.amp])
        return jnp.stack(
            [ground.step_width, ground.step_height, ground.n_steps,
             ground.ramp, ground.x0]
        )

    def _build_torque_spec(self):
        """TorqueSpec for the multi-substep kernel, or None when the
        torque path has opaque user hooks (closure controller,
        internal_dynamics) the kernel cannot bake. Motor parameters are
        baked as build-time constants — engines are constructed with
        concrete motor banks (per-env motor randomization would need a
        dedicated engine)."""
        import numpy as np

        from jiminy_tpu.ops.substep_kernel import TorqueSpec

        m = self.motors
        if (
            m is None
            or self.internal_dynamics is not None
            or (self.controller is not None and self.pd_controller is None)
        ):
            return None
        if self.pd_controller is not None:
            kp = np.broadcast_to(
                np.asarray(self.pd_controller.kp, np.float64), (m.nm,)
            )
            kd = np.broadcast_to(
                np.asarray(self.pd_controller.kd, np.float64), (m.nm,)
            )
            mode = "pd"
        else:
            kp = kd = None
            mode = "direct"
        return TorqueSpec(
            mode, m.q_idx, m.v_idx, np.asarray(m.reduction),
            np.asarray(m.effort_limit), np.asarray(m.velocity_limit),
            np.asarray(m.friction_dry), np.asarray(m.friction_viscous),
            np.asarray(m.friction_vel_eps), kp=kp, kd=kd,
        )

    def _get_multi_substep_fn(self, n_sub: int, randomized: bool = False):
        """The n_sub-substep fused kernel (one launch per env step),
        custom_vmap'd like the single-substep kernel; built lazily per
        (substep count, randomized) and cached (trace-time side effect —
        the build is pure numpy)."""
        key = (n_sub, randomized)
        fn = self._multi_substep_fns.get(key)
        if fn is not None:
            return fn
        from jiminy_tpu.ops.substep_kernel import (
            substep_batched_pallas_multi,
        )

        spec = (
            self._substep_spec_rand if randomized else self._substep_spec
        )

        if spec.n_gc:
            if randomized:
                call = lambda q, v, cmd, lam0, gc, w0, mp: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, cmd, lam0, gc, w0, mp=mp
                    )
                )
            else:
                call = lambda q, v, cmd, lam0, gc, w0: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, cmd, lam0, gc, w0
                    )
                )
        else:
            if randomized:
                call = lambda q, v, cmd, lam0, w0, mp: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, cmd, lam0, wrench=w0, mp=mp
                    )
                )
            else:
                call = lambda q, v, cmd, lam0, w0: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, cmd, lam0, wrench=w0
                    )
                )
        multi = _kernel_custom_vmap(call, 7)

        self._multi_substep_fns[key] = multi
        return multi

    # -- in-kernel sensor path --------------------------------------------
    def sensor_fusion_ready(self, suite, n_substeps: int,
                            k_obs: int) -> bool:
        """Can ``step_with_sensors`` serve this suite at this schedule?
        Static — envs check once at build. Requires the fused multi
        kernel (substep_fusion + declarative torque), supported sensor
        types, and k_obs | n_substeps."""
        if not (
            self.options.substep_fusion
            and self._use_impulse
            and self._substep_fn is not None
            and self._substep_spec.torque is not None
            and n_substeps % k_obs == 0
        ):
            return False
        try:
            self._get_sensor_spec(suite, k_obs, randomized=False)
        except ValueError:
            return False
        return True

    def _get_sensor_spec(self, suite, k_obs: int, randomized: bool):
        """Shallow SubstepSpec copy with the in-kernel sensor stage
        attached (SensorKernelSpec) — a distinct identity, so it keys
        its own kernel traces."""
        import copy

        from jiminy_tpu.ops.substep_kernel import SensorKernelSpec

        # the cached entry holds the SUITE itself: keying by id() alone
        # would let a garbage-collected suite's address be reused by a
        # different suite and silently return a stale spec (round-5
        # review finding)
        key = (id(suite), int(k_obs), bool(randomized))
        hit = self._sensor_specs.get(key)
        if hit is not None and hit[0] is suite:
            return hit[1]
        if randomized and self._get_rand_substep_fn() is None:
            raise ValueError("no randomized kernel in scope")
        base = (
            self._substep_spec_rand if randomized else self._substep_spec
        )
        spec = copy.copy(base)
        spec.sensors = SensorKernelSpec(self.tree, suite, k_obs)
        self._sensor_specs[key] = (suite, spec)
        return spec

    def _get_sensor_multi_fn(self, n_sub: int, suite, k_obs: int,
                             randomized: bool):
        from jiminy_tpu.ops.substep_kernel import (
            substep_batched_pallas_multi,
        )

        key = (n_sub, id(suite), int(k_obs), bool(randomized))
        fn = self._sensor_multi_fns.get(key)
        if fn is not None:
            return fn
        spec = self._get_sensor_spec(suite, k_obs, randomized)

        def make(has_gc, has_mp):
            if has_gc and has_mp:
                return lambda q, v, c, l, gc, w0, mp, bf, ep: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, c, l, gc, w0, mp=mp,
                        bufs=bf, eps=ep,
                    )
                )
            if has_gc:
                return lambda q, v, c, l, gc, w0, bf, ep: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, c, l, gc, w0, bufs=bf, eps=ep,
                    )
                )
            if has_mp:
                return lambda q, v, c, l, w0, mp, bf, ep: (
                    substep_batched_pallas_multi(
                        spec, n_sub, q, v, c, l, wrench=w0, mp=mp,
                        bufs=bf, eps=ep,
                    )
                )
            return lambda q, v, c, l, w0, bf, ep: (
                substep_batched_pallas_multi(
                    spec, n_sub, q, v, c, l, wrench=w0, bufs=bf, eps=ep,
                )
            )

        fn = _kernel_custom_vmap(
            make(spec.n_gc > 0, randomized), 8
        )
        self._sensor_multi_fns[key] = fn
        return fn

    def step_with_sensors(
        self,
        state: SimState,
        u: jax.Array,
        n_substeps: int,
        suite,
        bufs_flat: jax.Array,
        eps_flat: jax.Array,
        k_obs: int = 1,
        ground=None,
        base_wrench: jax.Array | None = None,
        model_params=None,
    ) -> tuple[SimState, jax.Array]:
        """Fused step WITH the in-kernel sensor stage: all n_substeps
        plus a measure→corrupt→ring-push every ``k_obs`` substeps run
        in ONE kernel launch (the reference's sensor refresh inside the
        stepper loop — SURVEY.md §3.1 — without leaving VMEM).
        ``bufs_flat`` (n_buf,) is the flattened suite ring-buffer state;
        ``eps_flat`` ((n_substeps//k_obs)·n_eps,) the PRE-SAMPLED
        corruption (bias + noise), layout per SensorKernelSpec. Callers
        gate availability with :meth:`sensor_fusion_ready`; per-call
        blockers (fext, contact overrides, foreign grounds) are on the
        caller. Returns (SimState, new bufs_flat)."""
        ground = ground if ground is not None else self.ground
        if not self._kernel_ground_ok(ground):
            raise ValueError("ground outside the fused kernel's scope")
        randomized = model_params is not None
        fn = self._get_sensor_multi_fn(
            n_substeps, suite, k_obs, randomized
        )
        w0 = (
            base_wrench
            if base_wrench is not None
            else jnp.zeros(6, dtype=state.q.dtype)
        )
        args = [state.q, state.v, u, state.lam]
        if self._substep_gmode != "flat":
            args.append(self._ground_coef(ground))
        args.append(w0)
        if randomized:
            args.append(self._pack_model_params(model_params))
        args += [bufs_flat, eps_flat]
        q, v, lam, res, fc, a, tau, bufs_out = fn(*args)
        dt = self.options.dt
        dt_ = state.q.dtype
        return (
            SimState(
                t=state.t + n_substeps * dt,
                q=q.astype(dt_),
                v=v.astype(dt_),
                contact_forces=(fc / dt).astype(dt_),
                solver_residual=res.astype(dt_),
                lam=lam.astype(dt_),
                a=a.astype(dt_),
                tau=tau.astype(dt_),
            ),
            bufs_out.astype(dt_),
        )

    @property
    def n_constraint_rows(self) -> int:
        """Static size of the stacked PGS system (kinematic + bounds +
        contacts); 0 on the pure spring-damper path."""
        if not self._use_impulse:
            return 0
        n = sum(c.size for c in self.constraints)
        if self._bounds_mode() == "constraint" and self.options.enable_bounds:
            n += len(self._bounded_joints())
        if self.options.contact_model == "constraint":
            n += 3 * self.tree.ncp
        if self._pair_set is not None:
            n += 3 * self._pair_set.total_contacts
        return n

    # -- state management ------------------------------------------------
    def reset(
        self, q: jax.Array | None = None, v: jax.Array | None = None
    ) -> SimState:
        tree = self.tree
        q = tree.neutral_q() if q is None else jnp.asarray(q)
        # all leaves follow q's dtype so an f64 caller (parity mode) gets
        # an f64-consistent scan carry
        dt_ = q.dtype
        return SimState(
            t=jnp.zeros((), dt_),
            q=q,
            v=jnp.zeros(tree.nv, dt_) if v is None else jnp.asarray(v),
            contact_forces=jnp.zeros((tree.ncp, 3), dt_),
            solver_residual=jnp.zeros((), dt_),
            lam=jnp.zeros(self.n_constraint_rows, dt_),
            a=jnp.zeros(tree.nv, dt_),
            tau=jnp.zeros(tree.nv, dt_),
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

    def _bounds_mode(self) -> str:
        bm = self.options.bounds_model
        if bm == "auto":
            return "constraint" if self._use_impulse else "penalty"
        return bm

    def _bounded_joints(self) -> list[int]:
        """1-DoF joints with finite position limits (computed eagerly once —
        limits are static topology, not per-env data)."""
        if self._bounded_cache_ is None:
            import numpy as np

            tree = self.tree
            q_min = np.asarray(tree.q_min)
            q_max = np.asarray(tree.q_max)
            out = []
            for i in range(tree.nb):
                if tree.joint_type[i] not in (
                    JointType.REVOLUTE,
                    JointType.PRISMATIC,
                ):
                    continue
                qo = tree.q_off[i]
                if q_min[qo] > -1e5 or q_max[qo] < 1e5:
                    out.append(i)
            self._bounded_cache_ = out
        return self._bounded_cache_

    def _joint_torque(
        self, u: jax.Array, q: jax.Array, v: jax.Array, t: jax.Array,
        motors=None,
    ) -> jax.Array:
        """Command → total actuation torque: inner-loop controller, motor
        model (if attached), joint damping, bound penalties, internal-
        dynamics hook (SURVEY.md §3.1: motor model + internal dynamics).
        ``motors`` optionally overrides the engine's bank (per-env motor
        randomization — engine/randomization.py)."""
        if self.controller is not None:
            u = self.controller(u, q, v, t)
        motors = motors if motors is not None else self.motors
        tau = motors.compute_effort(u, v) if motors is not None else u
        tau = tau - self.tree.damping * v + self._spring_torques(q)
        if self._bounds_mode() == "penalty":
            tau = tau + self._bound_torques(q, v)
        if self.internal_dynamics is not None:
            tau = tau + self.internal_dynamics(q, v, t)
        return tau

    def _spring_torques(self, q: jax.Array) -> jax.Array:
        """Joint springs toward the neutral configuration — the restoring
        torque of flexible joints (−k·log(quat) for spherical flexibility,
        −k·q for sprung 1-DoF joints). Reference: flexibility internal
        dynamics, SURVEY.md §2.1 "Model"/§3.1 "internal dynamics"."""
        import numpy as np

        from jiminy_tpu.math import so3

        tree = self.tree
        tau = jnp.zeros(tree.nv, dtype=q.dtype)
        stiff = np.asarray(tree.stiffness)
        if not np.any(stiff > 0):
            return tau
        for i in range(tree.nb):
            vo = tree.v_off[i]
            jt = tree.joint_type[i]
            nvj = 3 if jt == JointType.SPHERICAL else 1
            if jt == JointType.FREE or not np.any(stiff[vo : vo + nvj] > 0):
                continue
            qo = tree.q_off[i]
            k = tree.stiffness[tree.v_slice(i)]
            if jt == JointType.SPHERICAL:
                err = so3.quat_log(q[qo : qo + 4])
            else:
                err = q[qo : qo + 1]
            tau = tau.at[tree.v_slice(i)].add(-k * err)
        return tau

    @algos.f32_matmul  # TPU: bf16 default matmuls corrupt vmapped FK
    def dynamics(
        self,
        q: jax.Array,
        v: jax.Array,
        t: jax.Array,
        u: jax.Array,
        ground,
        fext_user: jax.Array | None = None,
        contact_params=None,
        model_params=None,
    ) -> tuple[jax.Array, jax.Array]:
        """Full system dynamics: (q, v, t, command u) → (a, contact
        forces). This is the reference's ``computeSystemsDynamics`` body
        (SURVEY.md §3.1 hot loop). ``model_params`` (an
        engine/randomization.ModelParams) perturbs the inertial/motor
        constants per env — pass batched leaves under vmap."""
        tree = self.tree
        # inertial randomization touches only the CRBA/RNEA inputs —
        # kinematics/Jacobians are geometric and stay on the nominal tree
        tree_dyn = (
            model_params.apply_to_tree(tree)
            if model_params is not None else tree
        )
        motors_rt = (
            model_params.apply_to_motors(self.motors)
            if model_params is not None else None
        )
        cparams = (
            contact_params if contact_params is not None
            else self.options.contacts
        )
        xw, vel = algos.kinematics(tree, q, v)
        fext, f_contact = compute_contact_fext(
            tree, xw, vel, ground, cparams, dt=self.options.dt,
            m_eff=self._contact_m_eff,
        )
        if self.forces:
            fext = fext + compute_registered_forces(
                tree, self.forces, t, xw, vel, q.dtype
            )
        if fext_user is not None:
            fext = fext + fext_user
        tau = self._joint_torque(u, q, v, t, motors=motors_rt)
        # forward dynamics via mass-matrix factorization: measurably faster
        # than the ABA sweep on TPU at robot sizes (see math/linalg.py);
        # algos.aba remains the reference implementation for testing
        M = algos.crba(tree_dyn, q)
        bias = algos.rnea(tree_dyn, q, v, jnp.zeros_like(v), fext)
        a = linalg.solve_psd(M, tau - bias)
        return a, f_contact

    # -- constraint / impulse dynamics --------------------------------------
    def _impulse_substep(
        self,
        q: jax.Array,
        v: jax.Array,
        t: jax.Array,
        u: jax.Array,
        ground,
        fext_user: jax.Array | None,
        lam0: jax.Array | None = None,
        contact_params=None,
        base_wrench: jax.Array | None = None,
        model_params=None,
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        """One semi-implicit Euler substep with velocity-level PGS impulses
        for kinematic constraints and (if contact_model == "constraint")
        ground contacts. Returns (q', v', contact_forces_world, residual,
        lam, a, tau) where a = (v'−v)/dt is the accepted acceleration and
        tau the applied actuation torque (both feed the sensor suite).

        This fuses the reference's ``PGSSolver::SolveBoxedForwardDynamics``
        into the integrator (SURVEY.md §3.1: constraint assembly → PGS →
        aba), formulated at the impulse level which is the standard
        fixed-step SPMD-friendly scheme."""
        tree = self.tree
        dt = self.options.dt
        opts = self.options

        # whole-substep Pallas fast path (one kernel launch per substep).
        # model_params rides the randomized-kernel variant (perturbed
        # inertials as a traced lane input — engine/randomization.py);
        # only configs with no randomized kernel fall back to XLA.
        use_kernel = (
            self._substep_fn is not None
            and fext_user is None
            and contact_params is None
            and self._kernel_ground_ok(ground)
        )
        kfn = self._substep_fn
        mp_vec = None
        if use_kernel and model_params is not None:
            kfn = self._get_rand_substep_fn()
            if kfn is None:
                use_kernel = False
            else:
                mp_vec = self._pack_model_params(model_params)
        if use_kernel:
            motors_rt = (
                model_params.apply_to_motors(self.motors)
                if model_params is not None else None
            )
            tau = self._joint_torque(u, q, v, t, motors=motors_rt)
            lam_w = (
                lam0
                if lam0 is not None
                else jnp.zeros(self.n_constraint_rows, dtype=q.dtype)
            )
            w0 = (
                base_wrench
                if base_wrench is not None
                else jnp.zeros(6, dtype=q.dtype)
            )
            args = [q, v, tau, lam_w]
            if self._substep_gmode != "flat":
                args.append(self._ground_coef(ground))
            args.append(w0)
            if mp_vec is not None:
                args.append(mp_vec)
            q2, v2, lam, res, fc = kfn(*args)
            return q2, v2, fc / dt, res, lam, (v2 - v) / dt, tau

        # per-env contact-parameter override (domain randomization: the
        # params are pytree leaves, so a vmapped caller can pass batched
        # per-env friction/stiffness — reference: model randomization
        # hooks, SURVEY.md §2.1 "Model")
        cparams = contact_params if contact_params is not None else opts.contacts
        if base_wrench is not None:
            bw = jnp.zeros((tree.nb, 6), q.dtype).at[0].set(base_wrench)
            fext_user = bw if fext_user is None else fext_user + bw
        # joint transforms computed once and shared by kinematics/CRBA/RNEA
        xl = algos._local_transforms(tree, q)
        xw, vel = algos.kinematics(tree, q, v, xl=xl)

        # per-env inertial/motor randomization (engine/randomization.py):
        # only the CRBA/RNEA inputs and the motor bank change — geometry
        # (kinematics, Jacobians, integrate) stays on the nominal tree
        tree_dyn = tree
        motors_rt = None
        if model_params is not None:
            tree_dyn = model_params.apply_to_tree(tree)
            motors_rt = model_params.apply_to_motors(self.motors)

        tau = self._joint_torque(u, q, v, t, motors=motors_rt)

        fext = fext_user
        if self.forces:
            fext_reg = compute_registered_forces(
                tree, self.forces, t, xw, vel, q.dtype
            )
            fext = fext_reg if fext is None else fext + fext_reg
        f_contact_sd = jnp.zeros((tree.ncp, 3), dtype=q.dtype)
        if opts.contact_model == "spring_damper" and tree.ncp > 0:
            fext_c, f_contact_sd = compute_contact_fext(
                tree, xw, vel, ground, cparams, dt=dt,
                m_eff=self._contact_m_eff,
            )
            fext = fext_c if fext is None else fext + fext_c

        # free dynamics via the mass-matrix factorization (we need M for the
        # Delassus matrix anyway, and the unrolled Cholesky is far cheaper
        # on TPU than a second ABA sweep — see math/linalg.py).
        # Joint damping and springs (flexibility) integrate IMPLICITLY:
        # (M + dt·C + dt²·K)·Δv = dt·(τ − C·v − K·q_err − dt·K·v) — the
        # backward-Euler-in-(C,K) scheme, unconditionally stable for stiff
        # flexibility (the reference relies on its adaptive stepper there;
        # fixed-step SPMD needs this instead, SURVEY.md §7 hard-parts).
        M = algos.crba(tree_dyn, q, xl=xl)
        M = M + jnp.diag(dt * tree.damping + dt * dt * tree.stiffness)
        bias = algos.rnea(tree_dyn, q, v, jnp.zeros_like(v), fext, xl=xl)
        tau_act = tau  # applied actuation torque (effort-sensor truth)
        tau = tau - dt * tree.stiffness * v
        p_free = tau - bias
        use_pallas = self._solver_backend == "pallas"
        if not use_pallas:
            # the Pallas kernel factors M itself — skip the XLA chain there
            L = linalg.cholesky(M)
            a_free = linalg.cho_solve(L, p_free)
            v_free = v + dt * a_free

        # ---- assemble constraint rows -------------------------------------
        J_k, target_k, active_k, blocks = cstr.assemble(
            tree, self.constraints, q, v, xw, vel, dt, ground
        )
        mu_parts = [jnp.zeros(J_k.shape[0], dtype=q.dtype)]
        Js, targets, actives = [J_k], [target_k], [active_k]
        off = J_k.shape[0]

        # ---- joint position bounds as unilateral PGS rows ------------------
        # (reference: bounds-as-constraints, SURVEY.md §2.1 "Model"; one row
        # per bounded joint, signed toward the nearest limit; far from the
        # limit the target is unreachable-negative so λ projects to 0)
        # NOTE: rows below are built with STATIC indexing only — gathers
        # that share an index vector are miscompiled by the current TPU
        # backend (see pgs_solve_grouped docstring).
        bounds_span = None
        if self._bounds_mode() == "constraint" and opts.enable_bounds:
            alpha_b = cstr.baumgarte_alpha(
                jnp.float32(opts.bounds_baumgarte_freq), dt
            )
            bj = self._bounded_joints()
            if bj:
                rows, tgts = [], []
                for i in bj:
                    qo, vo = tree.q_off[i], tree.v_off[i]
                    lo, hi = tree.q_min[qo], tree.q_max[qo]
                    d_lo = q[qo] - lo  # distance to lower bound (push +)
                    d_hi = hi - q[qo]  # distance to upper bound (push −)
                    s = jnp.where(d_lo < d_hi, 1.0, -1.0).astype(q.dtype)
                    dist = jnp.minimum(d_lo, d_hi)  # < 0 when violating
                    rows.append(
                        jnp.zeros(tree.nv, dtype=q.dtype).at[vo].set(s)
                    )
                    # violating: Baumgarte pushback; inside: may approach
                    # the bound but not cross it within this step
                    tgts.append(
                        jnp.where(dist < 0, -alpha_b * dist, -dist) / dt
                    )
                Js.append(jnp.stack(rows))
                targets.append(jnp.stack(tgts))
                actives.append(jnp.ones(len(bj), dtype=bool))
                mu_parts.append(jnp.zeros(len(bj), dtype=q.dtype))
                bounds_span = (off, len(bj))
                off += len(bj)

        use_contact_blocks = opts.contact_model == "constraint" and tree.ncp > 0
        contact_off = off
        contact_colors: list[tuple] = []
        # color-major layout: interleaved halves (diagonal leg pairs on
        # quadrupeds), each color's rows contiguous for static slicing
        color_order = list(range(0, tree.ncp, 2)) + list(range(1, tree.ncp, 2))
        if use_contact_blocks:
            pts, _, depth, n = surface_contacts(tree, xw, vel, ground)
            t1, t2 = cstr.tangent_basis(n)
            alpha = cstr.baumgarte_alpha(
                jnp.float32(opts.contact_baumgarte_freq), dt
            )
            # penetrating: Baumgarte pushback; hovering within the
            # margin: may approach the surface but not cross it this
            # substep (continuous activation — see contact_margin)
            v_corr = jnp.where(
                depth > 0.0,
                jnp.clip(
                    alpha / dt * (depth - opts.contact_slop),
                    0.0,
                    opts.contact_max_correction_vel,
                ),
                depth / dt,
            )
            n0 = len(range(0, tree.ncp, 2))
            contact_colors = [
                (contact_off, n0),
                (contact_off + 3 * n0, tree.ncp - n0),
            ]
            for k in color_order:
                b = tree.contact_body[k]
                Jp = algos.point_jacobian(tree, xw, b, pts[k])
                Jc = jnp.stack([t1[k] @ Jp, t2[k] @ Jp, n[k] @ Jp])
                Js.append(Jc)
                targets.append(
                    jnp.array([0.0, 0.0, 1.0], q.dtype) * v_corr[k]
                )
                actives.append(
                    jnp.repeat(depth[k] > -opts.contact_margin, 3)
                )
                mu_parts.append(
                    jnp.broadcast_to(
                        jnp.asarray(cparams.friction, q.dtype), (3,)
                    )
                )
                off += 3

        # ---- declared body-body / self-collision pairs ----------------------
        # (engine/collision.py): one [t1, t2, n] friction block per pair,
        # each its own PGS color (pairs may share bodies, so they update
        # SEQUENTIALLY — Gauss-Seidel between colors — while ground
        # contacts keep their two interleaved colors above)
        if self._pair_set is not None:
            from jiminy_tpu.engine.collision import pair_rows

            alpha_p = cstr.baumgarte_alpha(
                jnp.float32(opts.contact_baumgarte_freq), dt
            )
            Jp_, tgt_p, act_p, mu_p = pair_rows(
                self._pair_set, tree, xw, q.dtype, dt, alpha_p,
                opts.contact_margin, opts.contact_slop,
                opts.contact_max_correction_vel,
            )
            Js.append(Jp_)
            targets.append(tgt_p)
            actives.append(act_p)
            mu_parts.append(mu_p)
            # one color per pair, spanning that pair's contact block
            # (box-box pairs carry up to 16 point contacts — a contact
            # PATCH resolved vector-parallel within the color)
            for k_i in self._pair_set.contacts_per_pair:
                contact_colors.append((off, k_i))
                off += 3 * k_i

        nc = off
        if nc == 0:
            if use_pallas:
                v_free = v + dt * linalg.solve_psd(M, p_free)
            q_next = algos.integrate(tree, q, v_free, dt)
            return (
                q_next, v_free, f_contact_sd, jnp.zeros((), q.dtype),
                jnp.zeros(0, q.dtype), (v_free - v) / dt, tau_act,
            )

        J = jnp.concatenate(Js, axis=0)
        target = jnp.concatenate(targets, axis=0)
        active = jnp.concatenate(actives, axis=0)
        mu = jnp.concatenate(mu_parts, axis=0)

        if use_pallas:
            from jiminy_tpu.ops import SolveConfig, make_constraint_solver

            cfg = SolveConfig(
                n=tree.nv,
                nc=nc,
                dt=float(dt),
                eq_blocks=tuple(blocks),
                bounds_span=bounds_span,
                contact_colors=tuple(contact_colors),
                iters=opts.pgs_iters,
                relax=opts.pgs_relax,
                reg=opts.pgs_reg,
                compute_residual=opts.compute_solver_residual,
            )
            lam_w = (
                lam0 if lam0 is not None else jnp.zeros(nc, dtype=q.dtype)
            )
            v_next, lam, residual = make_constraint_solver(cfg)(
                M, p_free, v, J, target, mu, active, lam_w
            )
        else:
            MinvJT = linalg.cho_solve(L, J.T)  # (nv, nc)
            A = J @ MinvJT + opts.pgs_reg * jnp.eye(nc, dtype=q.dtype)
            rhs = target - J @ v_free
            # contacts in two interleaved colors (diagonal leg pairs on
            # quadrupeds): within a color rows update as vector ops — same
            # fixed point, ~4× shorter chain (see pgs_solve_grouped)
            lam, residual = pgs_solve_grouped(
                A,
                rhs,
                mu,
                active,
                eq_blocks=blocks,
                bounds_span=bounds_span,
                contact_colors=contact_colors,
                iters=opts.pgs_iters,
                relax=opts.pgs_relax,
                lam0=lam0,
                compute_residual=opts.compute_solver_residual,
            )
            v_next = v_free + MinvJT @ lam
        q_next = algos.integrate(tree, q, v_next, dt)

        if use_contact_blocks:
            lam_perm = lam[
                contact_off : contact_off + 3 * tree.ncp
            ].reshape(tree.ncp, 3)
            # un-permute from color-major back to contact order (static)
            inv = [0] * tree.ncp
            for j, k_orig in enumerate(color_order):
                inv[k_orig] = j
            lam_c = jnp.stack([lam_perm[inv[k]] for k in range(tree.ncp)])
            f_contact = (
                t1 * lam_c[:, 0:1] + t2 * lam_c[:, 1:2] + n * lam_c[:, 2:3]
            ) / dt
        else:
            f_contact = f_contact_sd
        return (
            q_next, v_next, f_contact, residual, lam,
            (v_next - v) / dt, tau_act,
        )

    # -- stepping ----------------------------------------------------------
    @algos.f32_matmul  # TPU: bf16 default matmuls corrupt vmapped FK
    def step(
        self,
        state: SimState,
        u: jax.Array,
        n_substeps: int = 1,
        ground=None,
        fext_user: jax.Array | None = None,
        contact_params=None,
        base_wrench: jax.Array | None = None,
        model_params=None,
    ) -> SimState:
        """Advance by ``n_substeps × options.dt`` with zero-order-hold
        command ``u`` (nv,). Pure; jit/vmap-able. ``contact_params``
        optionally overrides the engine's ContactParams — pass batched
        per-env values under vmap for domain randomization.
        ``base_wrench`` is an optional (6,) LOCAL [ang; lin] spatial
        wrench on the root body held over the step (push disturbances —
        reference: registerImpulseForce on the base). Unlike the generic
        ``fext_user`` (nb, 6), it stays on the whole-substep kernel
        paths. ``model_params`` (engine/randomization.ModelParams)
        perturbs inertial/motor constants per env; it rides the
        randomized-kernel variant (perturbed values as a traced lane
        input), falling back to XLA only when no kernel is in scope
        (silent fallback, same physics)."""
        ground = ground if ground is not None else self.ground
        dt = self.options.dt
        stepper = self._stepper
        tree = self.tree

        # multi-substep persistence: when the whole-substep kernel is
        # engaged AND the actuation-torque path is declarative (PD/direct
        # motor command — no opaque hooks), all n_substeps run in ONE
        # kernel launch with (q, v, λ) VMEM-resident and τ recomputed
        # in-kernel between substeps (docs/tpu_performance.md headroom;
        # the reference's per-breakpoint inner loop collapses entirely)
        use_fused = (
            self.options.substep_fusion
            and self._use_impulse
            and self._substep_fn is not None
            and self._substep_spec.torque is not None
            and fext_user is None
            and contact_params is None
            and self._kernel_ground_ok(ground)
        )
        mp_vec = None
        if use_fused and model_params is not None:
            # per-env randomization rides the randomized kernel variant
            if self._get_rand_substep_fn() is None:
                use_fused = False
            else:
                mp_vec = self._pack_model_params(model_params)
        if use_fused:
            fn = self._get_multi_substep_fn(
                n_substeps, randomized=mp_vec is not None
            )
            w0 = (
                base_wrench
                if base_wrench is not None
                else jnp.zeros(6, dtype=state.q.dtype)
            )
            args = [state.q, state.v, u, state.lam]
            if self._substep_gmode != "flat":
                args.append(self._ground_coef(ground))
            args.append(w0)
            if mp_vec is not None:
                args.append(mp_vec)
            q, v, lam, res, fc, a, tau = fn(*args)
            dt_ = state.q.dtype
            return SimState(
                t=state.t + n_substeps * dt,
                q=q.astype(dt_),
                v=v.astype(dt_),
                contact_forces=(fc / dt).astype(dt_),
                solver_residual=res.astype(dt_),
                lam=lam.astype(dt_),
                a=a.astype(dt_),
                tau=tau.astype(dt_),
            )

        if self._use_impulse:

            def body_imp(carry, _):
                q, v, t, _, _, lam, _, _ = carry
                dt_ = q.dtype  # keep the carry dtype-stable in f64
                # parity mode even if a solver branch emits f32
                q, v, f_c, res, lam, a, tau = (
                    x.astype(dt_)
                    for x in self._impulse_substep(
                        q, v, t, u, ground, fext_user, lam0=lam,
                        contact_params=contact_params,
                        base_wrench=base_wrench,
                        model_params=model_params,
                    )
                )
                return (q, v, t + dt, f_c, res, lam, a, tau), None

            (q, v, t, f_contact, res, lam, a, tau), _ = jax.lax.scan(
                body_imp,
                (
                    state.q,
                    state.v,
                    state.t,
                    state.contact_forces,
                    state.solver_residual,
                    state.lam,
                    state.a,
                    state.tau,
                ),
                None,
                length=n_substeps,
            )
            return SimState(
                t=t, q=q, v=v, contact_forces=f_contact,
                solver_residual=res, lam=lam, a=a, tau=tau,
            )

        cparams = (
            contact_params if contact_params is not None
            else self.options.contacts
        )
        if base_wrench is not None:
            bw = jnp.zeros((tree.nb, 6), state.q.dtype).at[0].set(
                base_wrench
            )
            fext_user = bw if fext_user is None else fext_user + bw

        def dyn(q, v, t):
            a, _ = self.dynamics(
                q, v, t, u, ground, fext_user, contact_params=cparams,
                model_params=model_params,
            )
            return a

        def body(carry, _):
            q, v, t = carry
            q, v = stepper(tree, dyn, q, v, t, dt)
            return (q, v, t + dt), None

        (q, v, t), _ = jax.lax.scan(
            body, (state.q, state.v, state.t), None, length=n_substeps
        )
        # refresh dynamics at the accepted state — contact forces AND the
        # accepted acceleration feed telemetry/sensors (IMU accelerometers,
        # effort sensors; VERDICT r1 weak #1)
        a, f_contact = self.dynamics(
            q, v, t, u, ground, fext_user, contact_params=cparams,
            model_params=model_params,
        )
        tau = self._joint_torque(
            u, q, v, t,
            motors=(
                model_params.apply_to_motors(self.motors)
                if model_params is not None else None
            ),
        )
        return SimState(
            t=t, q=q, v=v, contact_forces=f_contact,
            solver_residual=jnp.zeros((), q.dtype), lam=state.lam,
            a=a, tau=tau,
        )

    def simulate_adaptive(
        self,
        state: SimState,
        t_end: float,
        u: jax.Array | None = None,
        ground=None,
        dt_max: float | None = None,
        tol_abs: float = 1e-8,
        tol_rel: float = 1e-6,
    ) -> tuple[SimState, dict]:
        """Integrate to ``t_end`` with the adaptive DOPRI-5(4) stepper and
        PI error controller — the reference's default high-accuracy path
        (``stepper.odeSolver = runge_kutta_dopri``, tolAbs/tolRel/dtMax).
        Single-trajectory (data-dependent step count; not vmappable);
        requires the continuous-force path (no impulse constraints)."""
        if self._use_impulse:
            raise ValueError(
                "adaptive stepping requires the spring-damper contact path"
            )
        ground = ground if ground is not None else self.ground
        n_cmd = self.motors.nm if self.motors is not None else self.tree.nv
        u = jnp.zeros(n_cmd) if u is None else u

        def dyn(q, v, t):
            a, _ = self.dynamics(q, v, t, u, ground)
            return a

        t, q, v, stats = steppers.integrate_adaptive(
            self.tree,
            dyn,
            state.q,
            state.v,
            state.t,
            t_end,
            dt_init=self.options.dt,
            dt_max=dt_max if dt_max is not None else self.options.dt * 20,
            tol_abs=tol_abs,
            tol_rel=tol_rel,
        )
        a, f_contact = self.dynamics(q, v, t, u, ground)
        return SimState(
            t=t, q=q, v=v, contact_forces=f_contact,
            solver_residual=jnp.float32(0.0), lam=state.lam,
            a=a, tau=self._joint_torque(u, q, v, t),
        ), stats

    # -- options (reference: getOptions/setOptions dict trees) -------------
    def get_options(self) -> dict:
        """Nested option dict (reference: ``engine.getOptions()``)."""
        return dataclasses.asdict(self.options)

    def set_options(self, updates: dict) -> None:
        """Update options from a (partial) dict and rebuild derived state
        (reference: ``engine.setOptions()``)."""
        opts = self.options
        contacts = updates.pop("contacts", None)
        opts = dataclasses.replace(opts, **updates)
        if contacts is not None:
            from jiminy_tpu.engine.contact import ContactParams

            cur = dataclasses.asdict(opts)["contacts"]
            cur.update(contacts)
            opts = dataclasses.replace(
                opts,
                contacts=ContactParams(
                    **{k: jnp.float32(val) for k, val in cur.items()}
                ),
            )
        self.options = opts
        self._rebuild()

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
