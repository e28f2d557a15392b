"""Robot-from-log reconstruction, PPO L2/symmetry options, and fixed-seed
bit-determinism (reference tests: identical seeds ⇒ bit-identical logs —
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np


class TestSerialization:
    def test_robot_roundtrip(self):
        from jiminy_tpu.io.serialization import robot_from_json, robot_to_json
        from jiminy_tpu.models.quadruped import make_anymal

        robot = make_anymal()
        back = robot_from_json(robot_to_json(robot))
        assert back.tree.joint_name == robot.tree.joint_name
        assert back.tree.nq == robot.tree.nq
        np.testing.assert_array_equal(
            np.asarray(back.tree.inertia_mat), np.asarray(robot.tree.inertia_mat)
        )
        assert back.motors.name == robot.motors.name
        assert back.motors.q_idx == robot.motors.q_idx
        types = {g.type: g.ns for g in back.sensors.groups}
        assert types == {g.type: g.ns for g in robot.sensors.groups}

    def test_build_robot_from_log(self, tmp_path):
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.io.serialization import build_robot_from_log
        from jiminy_tpu.models.toys import make_pendulum
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator
        from jiminy_tpu.telemetry import read_log

        sim = Simulator(
            Robot(make_pendulum(), name="pendy"),
            ground=FlatGround(height=jnp.float32(-10.0)),
        )
        _, log = sim.simulate(0.05, q0=jnp.array([0.4]))
        log.write_binary(tmp_path / "run.jtpu")
        back = read_log(tmp_path / "run.jtpu")
        robot = build_robot_from_log(back)
        assert robot.name == "pendy"
        assert robot.tree.nq == 1
        # the reconstructed robot simulates identically
        sim2 = Simulator(robot, ground=FlatGround(height=jnp.float32(-10.0)))
        f2, log2 = sim2.simulate(0.05, q0=jnp.array([0.4]))
        np.testing.assert_array_equal(
            log2.columns["q.0"], log.columns["q.0"]
        )


class TestDeterminism:
    def test_simulate_bit_identical(self):
        from jiminy_tpu.engine.ground import FlatGround
        from jiminy_tpu.models.toys import make_double_pendulum
        from jiminy_tpu.robot import Robot
        from jiminy_tpu.simulator import Simulator

        def run():
            sim = Simulator(
                Robot(make_double_pendulum()),
                ground=FlatGround(height=jnp.float32(-10.0)),
            )
            _, log = sim.simulate(0.2, q0=jnp.array([0.5, -0.3]))
            return log

        a, b = run(), run()
        for k in a.columns:
            np.testing.assert_array_equal(a.columns[k], b.columns[k])

    def test_env_rollout_bit_identical(self):
        from jiminy_tpu.envs import CartPoleEnv

        env = CartPoleEnv()

        def run():
            st = jax.jit(env.reset)(jax.random.PRNGKey(7))
            step = jax.jit(env.step)
            traj = []
            for i in range(20):
                st = step(st, jnp.int32(i % 2))
                traj.append(np.asarray(st.obs))
            return np.stack(traj)

        np.testing.assert_array_equal(run(), run())


class TestPPOExtras:
    def test_l2_reg_shrinks_weights(self):
        from jiminy_tpu.envs import CartPoleEnv
        from jiminy_tpu.rl import PPOConfig
        from jiminy_tpu.rl.ppo import make_train_fn

        env = CartPoleEnv()

        def norm_after(l2):
            cfg = PPOConfig(
                num_envs=16, rollout_len=4, minibatches=2, epochs=2,
                hidden=(16, 16), l2_reg=l2, lr=1e-2,
            )
            init_fn, train_step, _ = make_train_fn(env, cfg)
            carry = init_fn(jax.random.PRNGKey(0), 16)
            step = jax.jit(train_step)
            for _ in range(5):
                carry, _ = step(carry)
            return float(
                sum(jnp.sum(jnp.square(W)) for W, _ in carry[0]["actor"])
            )

        assert norm_after(1e-2) < norm_after(0.0)

    def test_symmetry_loss_trains(self):
        from jiminy_tpu.envs import ANYmalEnv
        from jiminy_tpu.rl import PPOConfig
        from jiminy_tpu.rl.ppo import make_train_fn

        env = ANYmalEnv(observe="state", max_steps=50)
        cfg = PPOConfig(
            num_envs=8, rollout_len=2, minibatches=1, epochs=1,
            hidden=(32, 32), symmetry_coef=0.5,
        )
        init_fn, train_step, policy = make_train_fn(
            env, cfg, symmetry_fn=env.symmetry_fn
        )
        carry = init_fn(jax.random.PRNGKey(0), 8)
        carry, metrics = jax.jit(train_step)(carry)
        assert np.isfinite(float(metrics["pg_loss"]))


class TestANYmalSymmetry:
    def test_involution(self):
        from jiminy_tpu.envs import ANYmalEnv

        env = ANYmalEnv(observe="state")
        rng = np.random.RandomState(0)
        obs = jnp.asarray(rng.randn(4, 33).astype(np.float32))
        act = jnp.asarray(rng.randn(4, 12).astype(np.float32))
        o1, a1 = env.symmetry_fn(obs, act)
        o2, a2 = env.symmetry_fn(o1, a1)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(obs), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(act), atol=1e-6)

    def test_mirror_matches_dynamics(self):
        """step(mirror(s), mirror(a)) == mirror(step(s, a)) — validates the
        mirror spec against the actual physics."""
        from jiminy_tpu.envs import ANYmalEnv

        env = ANYmalEnv(observe="state")
        st = jax.jit(env.reset)(jax.random.PRNGKey(0))
        a = 0.3 * jnp.asarray(
            np.random.RandomState(2).randn(12).astype(np.float32)
        )
        nxt = jax.jit(env.step_no_reset)(st, a)
        _, a_m = env.symmetry_fn(st.obs, a)
        op, osgn, ap, asgn = env.mirror_spec()
        q, v = st.sim.q, st.sim.v
        qi = jnp.asarray(env.robot.motors.q_idx)
        vi = jnp.asarray(env.robot.motors.v_idx)
        quat = q[3:7]
        qm = (
            q.at[1].multiply(-1.0)
            .at[3].set(-quat[0])
            .at[5].set(-quat[2])
            .at[qi].set((q[qi])[ap] * asgn)
        )
        vm = (
            v.at[1].multiply(-1.0)
            .at[3].multiply(-1.0)
            .at[5].multiply(-1.0)
            .at[vi].set((v[vi])[ap] * asgn)
        )
        stm = st.replace(sim=st.sim.replace(q=qm, v=vm))
        nxt_m = jax.jit(env.step_no_reset)(stm, jnp.asarray(a_m))
        obs_expect, _ = env.symmetry_fn(nxt.obs, None)
        np.testing.assert_allclose(
            np.asarray(nxt_m.obs), np.asarray(obs_expect), atol=1e-5
        )
