"""ANYmal quadruped: URDF-pipeline build + env behavior (reference env
ANYmalJiminyEnv, SURVEY.md §2.5; pipeline-control steady state §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.models.quadruped import anymal_urdf, make_anymal, stand_q


class TestQuadrupedModel:
    def test_build_through_urdf_pipeline(self):
        robot = make_anymal()
        tree = robot.tree
        assert tree.nb == 13  # base + 4×(hip, thigh, shank); feet fused
        assert tree.nq == 19 and tree.nv == 18
        assert tree.ncp == 4  # one contact point per foot
        assert robot.nmotors == 12
        # feet fused: total mass includes feet
        assert abs(float(jnp.sum(tree.inertia_mass)) - 28.4) < 0.01
        # armature folded into the tree
        assert float(tree.armature[6]) == pytest.approx(0.07)
        # sensors: imu + 12 encoders + 12 efforts + 4 contacts
        types = {g.type: g.ns for g in robot.sensors.groups}
        assert types == {"imu": 1, "encoder": 12, "effort": 12, "contact": 4}

    def test_urdf_is_valid_xml(self):
        import xml.etree.ElementTree as ET

        root = ET.fromstring(anymal_urdf())
        assert root.tag == "robot"
        assert len(root.findall("link")) == 17
        assert len(root.findall("joint")) == 16


class TestANYmalEnv:
    @pytest.fixture(scope="class")
    def env(self):
        from jiminy_tpu.envs import ANYmalEnv

        return ANYmalEnv(observe="state", max_steps=100)

    def test_reset_and_shapes(self, env):
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        assert st.obs.shape == (33,)
        assert not bool(st.terminated)

    def test_stands_under_zero_action(self, env):
        B = 2
        states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), B)
        )
        step = jax.jit(jax.vmap(env.step))
        a = jnp.zeros((B, 12))
        for _ in range(10):  # 0.2 s
            states = step(states, a)
        assert bool(jnp.all(jnp.isfinite(states.obs)))
        assert bool(jnp.all(states.sim.q[:, 2] > 0.4))  # still upright
        assert bool(jnp.all(~states.terminated))
        assert bool(jnp.all(states.reward > 0.0))

    def test_terminates_when_fallen(self, env):
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        # lay the robot on its side (roll 90°)
        q = st.sim.q.at[3:7].set(jnp.array([0.7071, 0.0, 0.0, 0.7071]))
        q = q.at[2].set(0.2)
        st = st.replace(sim=st.sim.replace(q=q))
        nxt = jax.jit(env.step_no_reset)(st, jnp.zeros(12))
        assert bool(nxt.terminated)

    def test_auto_reset_restores_height(self, env):
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        q = st.sim.q.at[3:7].set(jnp.array([0.7071, 0.0, 0.0, 0.7071]))
        q = q.at[2].set(0.2)
        st = st.replace(sim=st.sim.replace(q=q))
        nxt = jax.jit(env.step)(st, jnp.zeros(12))
        # flags describe the finished step, state is a fresh episode
        assert bool(nxt.terminated)
        assert float(nxt.sim.q[2]) > 0.4
