"""Env zoo tests: Cassie (closed loops), Atlas, Ant, Spotmicro, gym
registration (reference env suite — SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCassie:
    def test_model_and_loop_holds(self):
        from jiminy_tpu.core import algos
        from jiminy_tpu.envs import CassieEnv

        env = CassieEnv(observe="state", max_steps=100)
        tree = env.tree
        assert env.robot.nmotors == 10
        # passive spring on the shin joints
        i = tree.joint_index("L_shin_spring")
        assert float(tree.stiffness[tree.v_off[i]]) == 1500.0
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(15):
            st = step(st, jnp.zeros(10))
        assert bool(jnp.all(jnp.isfinite(st.obs)))
        assert float(st.sim.q[2]) > 0.9  # standing
        # pushrod loop closure maintained during simulation
        c = env.engine.constraints[0]
        xw, _ = algos.kinematics(tree, st.sim.q, st.sim.v)
        p1 = xw[tree.frame_body[c.frame1]].compose(
            tree.frame_placement(c.frame1)
        ).pos
        p2 = xw[tree.frame_body[c.frame2]].compose(
            tree.frame_placement(c.frame2)
        ).pos
        assert abs(float(jnp.linalg.norm(p1 - p2)) - float(c.distance)) < 1e-3

    def test_knee_drives_tarsus_through_loop(self):
        """Moving the knee must move the tarsus (loop transmission)."""
        from jiminy_tpu.envs import CassieEnv

        env = CassieEnv(observe="state", max_steps=100)
        tree = env.tree
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        tarsus0 = float(st.sim.q[tree.q_off[tree.joint_index("L_tarsus")]])
        # command a knee bend through the PD targets
        a = jnp.zeros(10)
        knee_slot = list(env.robot.motors.name).index("L_knee")
        a = a.at[knee_slot].set(0.8)
        step = jax.jit(env.step_no_reset)
        for _ in range(15):
            st = step(st, a)
        tarsus1 = float(st.sim.q[tree.q_off[tree.joint_index("L_tarsus")]])
        # transmission ratio is small (short rod lever arms) but nonzero
        assert abs(tarsus1 - tarsus0) > 0.01


class TestCassieSelfCollision:
    def test_self_collision_pairs_active_and_finite(self):
        """CassieEnv(observe="state", self_collision=True) declares the L/R thigh/shin/
        tarsus capsule pairs (reference: hpp-fcl self-collision pairs,
        SURVEY.md §2.1 "Model"), gates the whole-substep kernel off,
        and still steps finitely."""
        from jiminy_tpu.envs import CassieEnv

        env = CassieEnv(observe="state", sim_dt=2e-3, self_collision=True)
        assert env.engine._pair_set is not None
        assert env.engine._pair_set.n == 3
        assert env.engine._substep_fn is None  # kernel fallback rule
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(3):
            st = step(st, jnp.zeros(env.action_size))
        assert bool(jnp.all(jnp.isfinite(st.obs)))


class TestAnt:
    def test_stands_and_steps(self):
        from jiminy_tpu.envs import AntEnv

        env = AntEnv(observe="state", max_steps=100)
        assert env.robot.nmotors == 8
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for i in range(10):
            a = jax.random.uniform(
                jax.random.PRNGKey(i), (8,), minval=-1, maxval=1
            )
            st = step(st, a)
        assert bool(jnp.all(jnp.isfinite(st.obs)))


class TestSpotmicro:
    def test_stands(self):
        from jiminy_tpu.envs import SpotmicroEnv

        env = SpotmicroEnv(observe="state", max_steps=100)
        assert env.robot.nmotors == 12
        assert float(jnp.sum(env.tree.inertia_mass)) < 3.0  # small robot
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(10):
            st = step(st, jnp.zeros(12))
        assert bool(jnp.all(jnp.isfinite(st.obs)))
        assert not bool(st.terminated)


class TestAtlasModel:
    def test_build_invariants(self):
        from jiminy_tpu.models.humanoid import atlas_stand_q, make_atlas

        robot = make_atlas()
        tree = robot.tree
        assert robot.nmotors == 23
        assert tree.nv == 29 and tree.nq == 30
        assert tree.ncp == 8  # 4 corners per foot
        q0 = atlas_stand_q(tree)
        assert abs(q0[2] - 0.96) < 0.05


class TestRegistration:
    def test_gym_make_and_step(self):
        import gymnasium

        from jiminy_tpu.envs import register_envs

        ids = register_envs()
        assert "jiminy_tpu/ANYmal-v0" in ids and len(ids) >= 7
        env = gymnasium.make("jiminy_tpu/Acrobot-v0")
        obs, info = env.reset(seed=3)
        assert obs.shape == env.observation_space.shape
        obs, r, term, trunc, _ = env.step(env.action_space.sample())
        assert np.isfinite(r)
        # idempotent re-registration
        register_envs()
