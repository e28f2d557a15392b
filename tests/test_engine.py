"""Engine + contact + stepper tests (analytical fixtures, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.engine import ContactParams, Engine, EngineOptions, FlatGround
from jiminy_tpu.engine.ground import HeightmapGround
from jiminy_tpu.models import make_cartpole, make_free_box, make_pendulum

G = 9.81


def test_box_rests_on_ground():
    """A box dropped from slightly above ground settles at the penetration
    depth where stiffness balances weight (spring-damper fixture)."""
    tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))
    opts = EngineOptions(
        dt=1e-3,
        contacts=ContactParams(
            stiffness=jnp.float32(1e4),
            damping=jnp.float32(1e2),
            friction=jnp.float32(1.0),
            transition_eps=jnp.float32(1e-5),
        ),
    )
    eng = Engine(tree, opts)
    q0 = tree.neutral_q().at[2].set(0.105)  # bottom corners 5 mm above ground
    state = eng.reset(q=q0)

    @jax.jit
    def run(state):
        final, _ = eng.simulate(state, t_end=1.0)
        return final

    final = run(state)
    # static equilibrium: 4 bottom corners, k·δ·4·act ≈ m·g; with tiny
    # transition_eps the activation is ~1 ⇒ δ ≈ mg/(4k) = 2.45e-4
    z = float(final.q[2])
    expected = 0.1 - G / (4 * 1e4)
    assert abs(z - expected) < 5e-4, (z, expected)
    assert float(jnp.abs(final.v).max()) < 1e-2
    # contact forces sum to weight
    fz = float(final.contact_forces[:, 2].sum())
    assert abs(fz - G) < 0.1, fz


def test_box_friction_stops_slide():
    """A box sliding on the ground decelerates via Coulomb friction
    a = μ·g and stops (not in the frictionless case)."""
    tree = make_free_box(mass=1.0, half_extents=(0.1, 0.1, 0.1))

    def run(mu):
        opts = EngineOptions(
            dt=5e-4,
            contacts=ContactParams(
                stiffness=jnp.float32(1e4),
                damping=jnp.float32(1e2),
                friction=jnp.float32(mu),
                transition_eps=jnp.float32(1e-5),
            ),
        )
        eng = Engine(tree, opts)
        q0 = tree.neutral_q().at[2].set(0.0999)
        v0 = jnp.zeros(6).at[0].set(1.0)  # 1 m/s along x
        state = eng.reset(q=q0, v=v0)

        @jax.jit
        def sim(state):
            final, _ = eng.simulate(state, t_end=1.0)
            return final

        return sim(state)

    with_friction = run(0.8)
    frictionless = run(0.0)
    assert float(jnp.abs(with_friction.v[0])) < 0.05
    assert float(frictionless.v[0]) > 0.9
    # with μ=0.8: v(t) = 1 - μ g t → stop at t≈0.127s, slide ≈ v²/(2μg) = 0.064m
    x = float(with_friction.q[0])
    assert abs(x - 1.0 / (2 * 0.8 * G)) < 0.01, x


def test_heightmap_ground_contact():
    """Box dropped over a raised heightmap plateau rests at plateau height."""
    tree = make_free_box()
    z = np.zeros((40, 40), np.float32)
    z[15:25, 15:25] = 0.5  # plateau under the box
    ground = HeightmapGround.create(z, x0=-2.0, y0=-2.0, dx=0.1, dy=0.1)
    eng = Engine(tree, EngineOptions(
        dt=1e-3,
        contacts=ContactParams(
            stiffness=jnp.float32(1e4), damping=jnp.float32(1e2),
            transition_eps=jnp.float32(1e-5),
        ),
    ))
    state = eng.reset(q=tree.neutral_q().at[2].set(0.75))

    @jax.jit
    def sim(state):
        final, _ = eng.simulate(state, t_end=1.0, ground=ground)
        return final

    final = sim(state)
    assert abs(float(final.q[2]) - 0.6) < 5e-3  # 0.5 plateau + 0.1 half-extent


def test_rk4_more_accurate_than_euler():
    """RK4 at dt=5e-3 beats semi-implicit Euler at the same dt against a
    reference dt=1e-5 solution (pendulum swing)."""
    tree = make_pendulum()
    q0, v0 = jnp.array([1.0]), jnp.zeros(1)

    def final_theta(solver, dt, t_end=1.0):
        eng = Engine(
            tree,
            EngineOptions(solver=solver, dt=dt, enable_bounds=False),
            ground=FlatGround(height=jnp.float32(-5.0)),  # out of reach
        )
        state = eng.reset(q=q0, v=v0)

        @jax.jit
        def sim(state):
            final, _ = eng.simulate(state, t_end=t_end)
            return final.q[0]

        return float(sim(state))

    ref = final_theta("runge_kutta_4", 1e-5)
    err_euler = abs(final_theta("euler_symplectic", 5e-3) - ref)
    err_rk4 = abs(final_theta("runge_kutta_4", 5e-3) - ref)
    assert err_rk4 < err_euler / 50
    assert err_rk4 < 1e-6


def test_simulate_trajectory_log():
    tree = make_cartpole()
    eng = Engine(tree, EngineOptions(dt=1e-3))
    state = eng.reset()

    @jax.jit
    def sim(state):
        return eng.simulate(state, t_end=0.1, control_dt=0.01)

    final, log = sim(state)
    assert log["q"].shape == (10, tree.nq)
    np.testing.assert_allclose(log["t"][-1], 0.1, atol=1e-5)
    np.testing.assert_allclose(final.q, log["q"][-1])


def test_joint_bounds_enforced():
    """Cartpole pushed hard into its track limit stays near the bound."""
    tree = make_cartpole(x_limit=0.5)
    eng = Engine(
        tree,
        EngineOptions(dt=1e-3, bounds_stiffness=1e4, bounds_damping=1e2),
    )
    state = eng.reset()

    @jax.jit
    def sim(state):
        final, _ = eng.simulate(
            state,
            t_end=2.0,
            controller=lambda q, v, t: jnp.array([20.0, 0.0]),
        )
        return final

    final = sim(state)
    assert float(final.q[0]) < 0.55  # limit + small penetration


def test_internal_dynamics_hook():
    """A PD internal-dynamics hook holds the pendulum at a target angle
    (reference: controller internal-dynamics effort, SURVEY.md §2.1)."""
    tree = make_pendulum()
    target = 0.5

    def pd(q, v, t):
        return 50.0 * (target - q) - 5.0 * v

    eng = Engine(
        tree,
        EngineOptions(dt=1e-3),
        ground=FlatGround(height=jnp.float32(-5.0)),
        internal_dynamics=pd,
    )
    state = eng.reset()

    @jax.jit
    def sim(state):
        final, _ = eng.simulate(state, t_end=3.0)
        return final

    final = sim(state)
    # steady state: k(target-θ) = m g L sinθ
    theta = float(final.q[0])
    residual = 50.0 * (target - theta) - G * np.sin(theta)
    assert abs(residual) < 3e-2
    assert abs(float(final.v[0])) < 5e-3


def test_batched_engine_step():
    """vmap over envs with per-env ground heights — one compiled program,
    heterogeneous terrain (engine design note)."""
    tree = make_free_box()
    eng = Engine(tree, EngineOptions(
        dt=1e-3,
        contacts=ContactParams(
            stiffness=jnp.float32(1e4), damping=jnp.float32(1e2),
            transition_eps=jnp.float32(1e-5),
        ),
    ))
    B = 8
    heights = jnp.linspace(0.0, 0.35, B)
    grounds = jax.vmap(lambda h: FlatGround(height=h))(heights)
    states = jax.vmap(
        lambda h: eng.reset(q=tree.neutral_q().at[2].set(h + 0.75))
    )(heights)

    @jax.jit
    def sim(states, grounds):
        def one(st, g):
            final, _ = eng.simulate(st, t_end=1.0, ground=g)
            return final

        return jax.vmap(one)(states, grounds)

    finals = sim(states, grounds)
    np.testing.assert_allclose(finals.q[:, 2], heights + 0.1, atol=5e-3)


class TestPenaltyFrictionStability:
    """Explicit regularized friction must not blow up under load: a
    PD-held ANYmal stance on the DEFAULT spring-damper path collapsed
    (z 0.54 -> 0.08 in 0.6 s) before the per-contact effective-mass
    slope clamp in contact.penalty_forces. Pin that it stands."""

    def test_anymal_pd_stance_stands(self):
        import jax
        import jax.numpy as jnp

        from jiminy_tpu.models import make_anymal
        from jiminy_tpu.models.quadruped import stand_q
        from jiminy_tpu.simulator import Simulator

        robot = make_anymal()
        tree = robot.tree
        q0 = jnp.asarray(stand_q(tree))
        qm0, _ = robot.motors.joint_state(q0, jnp.zeros(tree.nv))

        def pd(q, v, t):
            qm, vm = robot.motors.joint_state(q, v)
            return 80.0 * (qm0 - qm) - 2.0 * vm

        sim = Simulator(robot)  # default options: spring_damper, dt=1e-3
        final, _ = sim.simulate(
            1.0, q0=q0, v0=jnp.zeros(tree.nv), controller=pd
        )
        assert 0.45 < float(final.q[2]) < 0.6

    def test_effective_mass_is_leg_inertia_not_weight(self):
        import numpy as np

        from jiminy_tpu.engine.contact import contact_effective_mass
        from jiminy_tpu.models import make_anymal

        m = contact_effective_mass(make_anymal().tree)
        assert m.shape == (4,)
        # reflected leg inertia at the foot: well below the ~13 kg the
        # foot supports, well above the 0.1 kg foot link
        assert np.all(m > 0.1) and np.all(m < 3.0)
