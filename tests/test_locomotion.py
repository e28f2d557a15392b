"""WalkerEnv locomotion features: random terrain spawn, push disturbances
(reference: WalkerJiminyEnv — SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def perlin_env():
    """Analytic per-env hash-Perlin terrain (terrain='perlin')."""
    from jiminy_tpu.envs import ANYmalEnv

    return ANYmalEnv(observe="state", 
        terrain="perlin", push_magnitude=60.0, push_prob=0.5, max_steps=50
    )


class TestTerrainSpawn:
    def test_grid_spawns_spread_and_on_ground(self):
        """Shared grid heightmap ('perlin_grid'): random spawn disk over
        the map, base height leveled to the local terrain."""
        from jiminy_tpu.envs import ANYmalEnv

        env = ANYmalEnv(observe="state", terrain="perlin_grid", max_steps=50)
        B = 8
        states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), B)
        )
        xy = np.asarray(states.sim.q[:, :2])
        assert np.std(xy[:, 0]) > 0.5  # spread over the map
        # base height tracks local terrain height
        h, _ = env.engine.ground.query(states.sim.q[:, :2])
        rel = np.asarray(states.sim.q[:, 2]) - np.asarray(h)
        np.testing.assert_allclose(rel, rel[0], atol=0.02)

    def test_perlin_per_env_terrain_on_ground(self, perlin_env):
        """Analytic per-env Perlin ('perlin'): every env gets its OWN
        random ground (distinct seeds) and spawns leveled to it."""
        env = perlin_env
        B = 8
        states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), B)
        )
        grounds = states.info["ground"]
        seeds = np.asarray(grounds.seed)
        assert len(np.unique(seeds)) > 4  # terrains actually differ
        rel = []
        for i in range(B):
            g = jax.tree.map(lambda x: x[i], grounds)
            h, _ = g.query(states.sim.q[i, :2])
            rel.append(float(states.sim.q[i, 2]) - float(h))
        np.testing.assert_allclose(rel, rel[0], atol=0.02)

    def test_steps_on_terrain_stay_finite(self, perlin_env):
        env = perlin_env
        B = 4
        states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(1), B)
        )
        step = jax.jit(jax.vmap(env.step))
        for i in range(10):
            a = jax.random.uniform(
                jax.random.PRNGKey(i), (B, 12), minval=-1, maxval=1
            )
            states = step(states, a)
        assert bool(jnp.all(jnp.isfinite(states.obs)))


class TestPushes:
    def test_push_schedule_activates(self, perlin_env):
        env = perlin_env
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        seen_push = False
        for _ in range(10):
            st = step(st, jnp.zeros(12))
            if int(st.info["push_steps_left"]) > 0:
                seen_push = True
                assert float(jnp.linalg.norm(st.info["push_force"])) == (
                    pytest.approx(60.0, rel=1e-5)
                )
        assert seen_push  # p=0.5/step over 10 steps

    def test_push_moves_robot(self):
        from jiminy_tpu.envs import ANYmalEnv

        # deterministic check through the external-force hook directly
        env = ANYmalEnv(observe="state", push_magnitude=200.0, push_prob=0.0)
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        st = st.replace(
            info={
                **st.info,
                "push_force": jnp.array([200.0, 0.0, 0.0]),
                "push_steps_left": jnp.int32(25),
            }
        )
        step = jax.jit(env.step_no_reset)
        for _ in range(25):  # 0.5 s of 200 N on a 28 kg robot
            st = step(st, jnp.zeros(12))
        assert float(st.sim.q[0]) > 0.2  # shoved forward

    def test_no_push_config_is_clean(self):
        from jiminy_tpu.envs import ANYmalEnv

        env = ANYmalEnv(observe="state")
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        assert "push_force" not in st.info
        assert env._base_wrench(st) is None
        assert env._external_forces(st) is None
