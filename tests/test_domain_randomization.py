"""Per-env contact-parameter randomization (reference: model
randomization hooks, SURVEY.md §2.1 "Model")."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.contact import ContactParams
from jiminy_tpu.engine.engine import Engine, EngineOptions
from jiminy_tpu.models.toys import make_free_box


class TestContactRandomization:
    def test_batched_friction_controls_sliding(self):
        tree = make_free_box()
        eng = Engine(
            tree, EngineOptions(dt=1e-3, contact_model="constraint",
                                pgs_iters=24),
        )
        B = 4
        frictions = jnp.array([0.05, 0.3, 1.0, 2.0])
        params = ContactParams(
            stiffness=jnp.full(B, 1e5),
            damping=jnp.full(B, 2e3),
            friction=frictions,
            transition_velocity=jnp.full(B, 0.01),
            transition_eps=jnp.full(B, 1e-3),
        )
        q0 = jnp.tile(tree.neutral_q().at[2].set(0.0999), (B, 1))
        states = jax.vmap(lambda q: eng.reset(q=q))(q0)
        fext = jnp.zeros((tree.nb, 6)).at[0, 3].set(6.0)
        step = jax.jit(
            jax.vmap(
                lambda s, p: eng.step(
                    s, jnp.zeros(tree.nv), n_substeps=500,
                    fext_user=fext, contact_params=p,
                )
            )
        )
        out = step(states, params)
        x = np.asarray(out.q[:, 0])
        assert x[0] > 0.2  # near-frictionless: slides far
        assert abs(x[3]) < 0.01  # high friction: pinned
        assert x[0] > x[1] > x[2]  # monotone in friction

    def test_spring_damper_override(self):
        tree = make_free_box()
        eng = Engine(tree, EngineOptions(dt=1e-3))
        soft = ContactParams(
            stiffness=jnp.float32(5e3), damping=jnp.float32(100.0),
            friction=jnp.float32(1.0),
            transition_velocity=jnp.float32(0.01),
            transition_eps=jnp.float32(1e-3),
        )
        q0 = tree.neutral_q().at[2].set(0.12)
        run = jax.jit(
            lambda p: eng.step(
                eng.reset(q=q0), jnp.zeros(tree.nv), n_substeps=1500,
                contact_params=p,
            )
        )
        z_soft = float(run(soft).q[2])
        z_stiff = float(
            jax.jit(
                lambda: eng.step(
                    eng.reset(q=q0), jnp.zeros(tree.nv), n_substeps=1500
                )
            )().q[2]
        )
        # soft ground sinks deeper at rest than the default stiff ground
        assert z_soft < z_stiff - 1e-4
