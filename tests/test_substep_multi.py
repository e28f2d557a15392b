"""Multi-substep persistence kernel vs the per-substep paths.

One kernel launch advances all n_substeps with (q, v, λ) VMEM-resident
and the actuation torque (declarative PD / direct motor command + motor
model + damping/springs) recomputed IN-KERNEL between substeps
(ops/substep_kernel.py `_substep_multi_body`; engine fast path in
Engine.step). Interpret mode on the CPU CI mesh must match the XLA
engine to f32 reassociation — including the SimState.a/tau sensor
outputs (VERDICT r1 weak #1 machinery)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core.tree import JointType
from jiminy_tpu.engine.engine import Engine, EngineOptions, PDController


def _perturbed_batch(tree, q0, B=4, scale=0.02, seed=0):
    qb = jnp.tile(q0, (B, 1)) + scale * jax.random.normal(
        jax.random.PRNGKey(seed), (B, tree.nq)
    )
    for i in range(tree.nb):
        if tree.joint_type[i] == JointType.FREE:
            qo = tree.q_off[i]
            quat = qb[:, qo + 3 : qo + 7]
            quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
            qb = qb.at[:, qo + 3 : qo + 7].set(quat)
    return qb


def _step_both(engines, qb, u, n_substeps):
    outs = {}
    for backend, eng in engines.items():
        states = jax.vmap(lambda q: eng.reset(q=q))(qb)
        step = jax.jit(
            jax.vmap(lambda s, uu: eng.step(s, uu, n_substeps=n_substeps))
        )
        outs[backend] = step(states, u)
    return outs["xla"], outs["pallas_substep"]


def _assert_close(a, b, atol_q=1e-4, atol_v=1e-2, atol_a=2.0, atol_tau=1e-2):
    np.testing.assert_allclose(b.q, a.q, atol=atol_q, rtol=1e-3)
    np.testing.assert_allclose(b.v, a.v, atol=atol_v, rtol=1e-2)
    # sensor inputs: accepted acceleration + applied torque of the last
    # substep (a amplifies v-noise by 1/dt — tolerance scales with it)
    np.testing.assert_allclose(b.a, a.a, atol=atol_a, rtol=1e-2)
    np.testing.assert_allclose(b.tau, a.tau, atol=atol_tau, rtol=1e-3)
    scale = max(1.0, float(jnp.max(jnp.abs(a.contact_forces))))
    np.testing.assert_allclose(
        np.asarray(b.contact_forces) / scale,
        np.asarray(a.contact_forces) / scale,
        atol=5e-3,
    )


class TestMultiSubstep:
    def test_anymal_pd_matches_xla(self):
        """Declarative PD baked in-kernel: 4 substeps, one launch."""
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    compute_solver_residual=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                controller=PDController(60.0, 2.0),
            )
            for backend in ("xla", "pallas_substep")
        }
        eng = engines["pallas_substep"]
        assert eng._substep_spec.torque is not None
        assert eng._substep_spec.torque.mode == "pd"
        qb = _perturbed_batch(tree, jnp.asarray(stand_q(tree)))
        u = jnp.zeros((4, robot.nmotors))
        a, b = _step_both(engines, qb, u, n_substeps=4)
        _assert_close(a, b)
        # multi kernel actually built (and only for this substep count)
        assert list(eng._multi_substep_fns) == [(4, False)]

    def test_anymal_pd_randomized_matches_xla(self):
        """Per-env model randomization IN the fused kernel: perturbed
        inertials/armature/motor scales arrive as a traced lane input
        (VERDICT r4 next #1 — the 21× XLA-fallback training tax is
        gone). Both backends get the same per-env ModelParams and must
        agree; the multi kernel must be the randomized variant."""
        from jiminy_tpu.engine.randomization import ModelRandomization
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    compute_solver_residual=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                controller=PDController(60.0, 2.0),
            )
            for backend in ("xla", "pallas_substep")
        }
        B = 4
        mr = ModelRandomization(
            mass_scale=(0.8, 1.2), com_offset=0.02,
            inertia_scale=(0.8, 1.2), armature_scale=(0.7, 1.3),
            motor_gain=(0.9, 1.1), motor_friction_scale=(0.5, 2.0),
        )
        mps = jax.vmap(lambda k: mr.sample(k, tree, robot.motors))(
            jax.random.split(jax.random.PRNGKey(5), B)
        )
        # IDENTICAL q0 across the batch: any divergence between envs can
        # only come from the per-env model parameters. Base dropped so
        # the feet actually load (stand_q hovers 1 cm above ground).
        qb = _perturbed_batch(
            tree, jnp.asarray(stand_q(tree)).at[2].add(-0.012),
            B=B, scale=0.0,
        )
        u = jnp.zeros((B, robot.nmotors))
        outs = {}
        for backend, eng in engines.items():
            states = jax.vmap(lambda q: eng.reset(q=q))(qb)
            step = jax.jit(
                jax.vmap(
                    lambda s, uu, p: eng.step(
                        s, uu, n_substeps=4, model_params=p
                    )
                )
            )
            outs[backend] = step(states, u, mps)
        eng = engines["pallas_substep"]
        assert list(eng._multi_substep_fns) == [(4, True)]
        a, b = outs["xla"], outs["pallas_substep"]
        _assert_close(a, b)
        # randomization must actually move the physics: identical q0,
        # different param draws → different loaded-contact response
        assert float(jnp.max(jnp.abs(b.v[0] - b.v[1]))) > 1e-3

    @pytest.mark.slow  # interpret-mode Pallas: minutes on CPU
    def test_anymal_direct_mode_matches_xla(self):
        """No controller: cmd is the motor command, friction/derate still
        re-evaluated per substep at the current velocity."""
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
            )
            for backend in ("xla", "pallas_substep")
        }
        assert engines["pallas_substep"]._substep_spec.torque.mode == "direct"
        qb = _perturbed_batch(tree, jnp.asarray(stand_q(tree)))
        u = jnp.tile(
            jnp.asarray(
                np.random.default_rng(1)
                .normal(0.0, 1.0, robot.nmotors)
                .astype(np.float32)
            ),
            (4, 1),
        )
        a, b = _step_both(engines, qb, u, n_substeps=3)
        _assert_close(a, b)

    def test_opaque_controller_falls_back(self):
        """A closure controller can't be baked: the engine must keep the
        per-substep kernel path (and still agree with XLA)."""
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree

        def ctl(cmd, q, v, t):
            qm, vm = robot.motors.joint_state(q, v)
            return 60.0 * (cmd - qm) - 2.0 * vm

        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                controller=ctl,
            )
            for backend in ("xla", "pallas_substep")
        }
        eng = engines["pallas_substep"]
        assert eng._substep_spec.torque is None
        qb = _perturbed_batch(tree, jnp.asarray(stand_q(tree)), B=2)
        a, b = _step_both(engines, qb, jnp.zeros((2, robot.nmotors)), 2)
        _assert_close(a, b)
        assert not eng._multi_substep_fns

    @pytest.mark.slow  # interpret-mode Pallas: minutes on CPU
    def test_pd_declarative_equals_closure(self):
        """PDController.bind reproduces the hand-written closure exactly
        on the XLA path (the declarative swap in WalkerEnv is a no-op
        numerically)."""
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree

        def ctl(cmd, q, v, t):
            qm, vm = robot.motors.joint_state(q, v)
            return 60.0 * (cmd - qm) - 2.0 * vm

        opts = EngineOptions(
            contact_model="constraint", constraint_solver="xla",
            dt=5e-3, pgs_iters=4,
        )
        e1 = Engine(tree, opts, motors=robot.motors, controller=ctl)
        e2 = Engine(
            tree, opts, motors=robot.motors,
            controller=PDController(60.0, 2.0),
        )
        q0 = jnp.asarray(stand_q(tree))
        u = jnp.full((robot.nmotors,), 0.1)
        s1 = e1.step(e1.reset(q=q0), u, n_substeps=4)
        s2 = e2.step(e2.reset(q=q0), u, n_substeps=4)
        np.testing.assert_array_equal(np.asarray(s1.q), np.asarray(s2.q))
        np.testing.assert_array_equal(np.asarray(s1.v), np.asarray(s2.v))

    @pytest.mark.slow  # interpret-mode Pallas: minutes on CPU
    def test_base_wrench_matches_xla(self):
        """Push disturbances as the (6,) base_wrench input: the kernel
        paths (single-substep and fused) must match the XLA path fed the
        equivalent (nb, 6) fext — push-robustness training stays on the
        fast path (reference: external forces on the base,
        SURVEY.md §2.1 'Engine')."""
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        wrench = jnp.asarray(
            [0.5, -0.3, 0.2, 60.0, -40.0, 10.0], jnp.float32
        )
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                controller=PDController(60.0, 2.0),
            )
            for backend in ("xla", "pallas_substep")
        }
        qb = _perturbed_batch(tree, jnp.asarray(stand_q(tree)), B=2)
        u = jnp.zeros((2, robot.nmotors))
        wb = jnp.tile(wrench, (2, 1))
        outs = {}
        for backend, eng in engines.items():
            states = jax.vmap(lambda q: eng.reset(q=q))(qb)
            step = jax.jit(
                jax.vmap(
                    lambda s, uu, w: eng.step(
                        s, uu, n_substeps=3, base_wrench=w
                    )
                )
            )
            outs[backend] = step(states, u, wb)
        a, b = outs["xla"], outs["pallas_substep"]
        np.testing.assert_allclose(b.q, a.q, atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(b.v, a.v, atol=1e-2, rtol=1e-2)
        # the wrench must actually perturb the dynamics
        eng = engines["xla"]
        states = jax.vmap(lambda q: eng.reset(q=q))(qb)
        no_w = jax.jit(
            jax.vmap(lambda s, uu: eng.step(s, uu, n_substeps=3))
        )(states, u)
        assert float(jnp.max(jnp.abs(no_w.v - a.v))) > 1e-3

    def test_set_options_rebuilds_fusion_state(self):
        """set_options must never leave a stale fused kernel behind
        (same contract as the single-substep kernel — VERDICT r1 weak
        #2): flipping the flag or mutating baked options clears the
        per-n_sub kernel cache and rebuilds the torque spec."""
        from jiminy_tpu.models.quadruped import make_anymal

        robot = make_anymal()
        eng = Engine(
            robot.tree,
            EngineOptions(
                contact_model="constraint",
                constraint_solver="pallas_substep",
                dt=5e-3,
                pgs_iters=4,
            ),
            motors=robot.motors,
            controller=PDController(60.0, 2.0),
        )
        assert eng.options.substep_fusion  # default ON since TPU validation
        eng.set_options({"substep_fusion": False})
        assert not eng.options.substep_fusion
        # simulate a built kernel cache, then mutate options
        eng._multi_substep_fns[4] = lambda *a: a
        eng.set_options({"substep_fusion": True})
        assert eng.options.substep_fusion
        assert eng._multi_substep_fns == {}
        assert eng._substep_spec.torque is not None
        assert eng._substep_spec.torque.mode == "pd"
        eng._multi_substep_fns[4] = lambda *a: a
        eng.set_options({"dt": 2e-3})
        assert eng._multi_substep_fns == {}
        assert float(eng._substep_spec.cfg.dt) == 2e-3

    @pytest.mark.slow
    def test_stairs_ground_fused_matches_xla(self):
        """Analytic stairs + multi-substep fusion in one launch (the
        stairs-training fast path): robot straddling a riser matches the
        XLA path."""
        from jiminy_tpu.engine.ground import StairsGround
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        sg = StairsGround.create(
            step_width=0.4, step_height=0.08, n_steps=10, ramp=0.05
        )
        q0 = jnp.asarray(stand_q(tree))
        q0 = q0.at[0].set(0.35).at[2].set(q0[2] + 0.08)
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                ground=sg,
                controller=PDController(60.0, 2.0),
            )
            for backend in ("xla", "pallas_substep")
        }
        qb = _perturbed_batch(tree, q0, B=2)
        a, b = _step_both(engines, qb, jnp.zeros((2, robot.nmotors)), 3)
        _assert_close(a, b)
        scale = max(1.0, float(jnp.max(jnp.abs(a.contact_forces))))
        assert scale > 1.0  # actually standing on the staircase

    @pytest.mark.slow
    def test_fourier_ground_pd_matches_xla(self):
        """Per-env Fourier terrain + in-kernel PD, one launch for 3
        substeps (rough-terrain training path)."""
        from jiminy_tpu.engine.ground import sample_fourier_ground
        from jiminy_tpu.models.quadruped import make_anymal, stand_q

        robot = make_anymal()
        tree = robot.tree
        fg = sample_fourier_ground(
            jax.random.PRNGKey(3), n_terms=8, amplitude=0.06,
            wavelength=1.5,
        )
        engines = {
            backend: Engine(
                tree,
                EngineOptions(
                    contact_model="constraint",
                    constraint_solver=backend,
                    substep_fusion=True,
                    dt=5e-3,
                    pgs_iters=4,
                ),
                motors=robot.motors,
                ground=fg,
                controller=PDController(60.0, 2.0),
            )
            for backend in ("xla", "pallas_substep")
        }
        qb = _perturbed_batch(tree, jnp.asarray(stand_q(tree)), B=2)
        a, b = _step_both(engines, qb, jnp.zeros((2, robot.nmotors)), 3)
        _assert_close(a, b)
