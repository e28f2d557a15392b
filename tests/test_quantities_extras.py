"""Support-polygon margin quantity + gym adapter render."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.engine import SimState
from jiminy_tpu.envs.quantities import QuantityContext
from jiminy_tpu.models.toys import make_free_box


def _ctx_square(loaded_suffix="-0.10"):
    tree = make_free_box()  # ±0.1 corner square
    q = tree.neutral_q().at[2].set(0.1)
    fc = jnp.zeros((8, 3))
    for k, name in enumerate(tree.contact_frame_name):
        if name.endswith(loaded_suffix):
            fc = fc.at[k, 2].set(5.0)
    sim = SimState(t=jnp.float32(0), q=q, v=jnp.zeros(6), contact_forces=fc)
    return tree, QuantityContext(tree, sim)


class TestSupportPolygon:
    def test_margin_geometry(self):
        _, ctx = _ctx_square()
        assert abs(
            float(ctx.support_polygon_margin(jnp.array([0.0, 0.0]), 64)) - 0.1
        ) < 0.01
        assert abs(
            float(ctx.support_polygon_margin(jnp.array([0.1, 0.0]), 64))
        ) < 0.01
        assert abs(
            float(ctx.support_polygon_margin(jnp.array([0.3, 0.0]), 64)) + 0.2
        ) < 0.01

    def test_only_loaded_contacts_count(self):
        tree, ctx = _ctx_square()
        # unload everything except one corner: margin from a point polygon
        fc = jnp.zeros((8, 3)).at[0, 2].set(5.0)
        ctx2 = QuantityContext(tree, ctx.sim.replace(contact_forces=fc))
        m = float(ctx2.support_polygon_margin(jnp.array([0.0, 0.0]), 64))
        assert m < -0.1  # point support ⇒ ZMP-at-origin far outside

    def test_jits_and_vmaps(self):
        tree, ctx = _ctx_square()

        @jax.jit
        def f(sim):
            return QuantityContext(tree, sim).support_polygon_margin()

        m = f(ctx.sim)
        assert bool(jnp.isfinite(m))


class TestRender:
    def test_rgb_array_frame(self):
        from jiminy_tpu.envs import CartPoleEnv
        from jiminy_tpu.envs.gym_adapter import make_gym_env

        genv = make_gym_env(CartPoleEnv())
        genv.reset(seed=0)
        frame = genv.render()
        assert frame.ndim == 3 and frame.shape[2] == 3
        assert frame.dtype == np.uint8
        genv.step(genv.action_space.sample())
        frame2 = genv.render()
        assert frame2.shape == frame.shape
