"""Rigid-body algorithm tests — analytical fixtures and cross-consistency
(reference test strategy: SURVEY.md §4 "analytical or closed-form fixtures")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.core import algos
from jiminy_tpu.core.tree import JointType
from jiminy_tpu.models import (
    make_acrobot,
    make_cartpole,
    make_double_pendulum,
    make_free_box,
    make_pendulum,
)

G = 9.81


def rand_state(tree, seed, scale=1.0):
    """Random valid (q, v) for a tree (quaternions normalized)."""
    kq, kv = jax.random.split(jax.random.PRNGKey(seed))
    q = np.array(jax.random.normal(kq, (tree.nq,)) * scale)
    for i in range(tree.nb):
        t = tree.joint_type[i]
        off = tree.q_off[i]
        if t == JointType.FREE:
            quat = q[off + 3 : off + 7]
            q[off + 3 : off + 7] = quat / np.linalg.norm(quat)
        elif t == JointType.SPHERICAL:
            quat = q[off : off + 4]
            q[off : off + 4] = quat / np.linalg.norm(quat)
    v = jax.random.normal(kv, (tree.nv,)) * scale
    return jnp.asarray(q, jnp.float32), v.astype(jnp.float32)


ALL_TREES = {
    "pendulum": make_pendulum(),
    "double_pendulum": make_double_pendulum(),
    "cartpole": make_cartpole(),
    "acrobot": make_acrobot(),
    "free_box": make_free_box(),
}


def test_fk_pendulum_analytic():
    tree = make_pendulum(length=1.0)
    theta = 0.3
    xw = algos.forward_kinematics(tree, jnp.array([theta]))
    poses, _ = algos.frame_kinematics(tree, xw)
    tip = poses[tree.frame_index("tip")].pos
    # rotation about +y maps (0,0,-L) to (-L sinθ, 0, -L cosθ)
    np.testing.assert_allclose(
        tip, [-np.sin(theta), 0.0, -np.cos(theta)], atol=1e-6
    )


def test_pendulum_dynamics_analytic():
    tree = make_pendulum(length=1.0, mass=2.0)
    theta = jnp.array([0.7])
    qdd = algos.aba(tree, theta, jnp.zeros(1), jnp.zeros(1))
    np.testing.assert_allclose(qdd[0], -G * np.sin(0.7), rtol=1e-5)


def test_pendulum_armature_effect():
    tree = make_pendulum(length=1.0, mass=1.0, armature=0.5)
    theta = jnp.array([0.7])
    qdd = algos.aba(tree, theta, jnp.zeros(1), jnp.zeros(1))
    # I_eff = m L² + armature; tau_g = -m g L sinθ
    np.testing.assert_allclose(qdd[0], -G * np.sin(0.7) / 1.5, rtol=1e-5)
    # rnea must invert it
    tau = algos.rnea(tree, theta, jnp.zeros(1), qdd)
    np.testing.assert_allclose(tau, jnp.zeros(1), atol=1e-5)


def test_free_box_falls():
    tree = make_free_box()
    q = tree.neutral_q()
    a = algos.aba(tree, q, jnp.zeros(6), jnp.zeros(6))
    np.testing.assert_allclose(a, [0, 0, -G, 0, 0, 0], atol=1e-5)


@pytest.mark.parametrize("name", list(ALL_TREES))
def test_aba_rnea_roundtrip(name):
    tree = ALL_TREES[name]
    q, v = rand_state(tree, seed=42)
    tau = jax.random.normal(jax.random.PRNGKey(7), (tree.nv,))
    a = algos.aba(tree, q, v, tau)
    tau2 = algos.rnea(tree, q, v, a)
    np.testing.assert_allclose(tau2, tau, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("name", list(ALL_TREES))
def test_crba_matches_rnea_columns(name):
    tree = ALL_TREES[name]
    q, _ = rand_state(tree, seed=3)
    M = algos.crba(tree, q)
    bias = algos.rnea(tree, q, jnp.zeros(tree.nv), jnp.zeros(tree.nv))
    for j in range(tree.nv):
        ej = jnp.zeros(tree.nv).at[j].set(1.0)
        col = algos.rnea(tree, q, jnp.zeros(tree.nv), ej) - bias
        np.testing.assert_allclose(M[:, j], col, atol=2e-3, rtol=1e-4)
    # symmetry
    np.testing.assert_allclose(M, M.T, atol=1e-4)


@pytest.mark.parametrize("name", list(ALL_TREES))
def test_aba_with_external_forces(name):
    tree = ALL_TREES[name]
    q, v = rand_state(tree, seed=11)
    tau = jax.random.normal(jax.random.PRNGKey(13), (tree.nv,))
    fext = 0.5 * jax.random.normal(jax.random.PRNGKey(17), (tree.nb, 6))
    a = algos.aba(tree, q, v, tau, fext)
    tau2 = algos.rnea(tree, q, v, a, fext)
    np.testing.assert_allclose(tau2, tau, atol=2e-3, rtol=1e-4)


def test_double_pendulum_mass_matrix_analytic():
    # classic 2-link point-mass pendulum mass matrix
    l1 = l2 = 1.0
    m1, m2 = 1.0, 0.5
    tree = make_double_pendulum(l1, l2, m1, m2)
    q = jnp.array([0.3, -0.8])
    t2 = q[1]
    M = algos.crba(tree, q)
    m11 = (m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * np.cos(t2)
    m12 = m2 * l2**2 + m2 * l1 * l2 * np.cos(t2)
    m22 = m2 * l2**2
    np.testing.assert_allclose(
        M, [[m11, m12], [m12, m22]], rtol=1e-5, atol=1e-6
    )


def test_integrate_difference_roundtrip():
    tree = make_free_box()
    q, v = rand_state(tree, seed=21)
    dt = 0.01
    q2 = algos.integrate(tree, q, v, dt)
    dv = algos.difference(tree, q, q2)
    np.testing.assert_allclose(dv, v * dt, atol=1e-5)


def test_energy_conservation_pendulum():
    """Undamped pendulum with RK4-style substeps conserves energy
    (reference C++ unit test pattern, SURVEY.md §4)."""
    tree = make_pendulum(length=1.0, mass=1.0)
    q = jnp.array([1.2])
    v = jnp.zeros(1)
    dt = 1e-3

    def deriv(q, v):
        return v, algos.aba(tree, q, v, jnp.zeros(1))

    @jax.jit
    def rk4_step(q, v):
        k1q, k1v = deriv(q, v)
        k2q, k2v = deriv(q + 0.5 * dt * k1q, v + 0.5 * dt * k1v)
        k3q, k3v = deriv(q + 0.5 * dt * k2q, v + 0.5 * dt * k2v)
        k4q, k4v = deriv(q + dt * k3q, v + dt * k3v)
        q = q + dt / 6.0 * (k1q + 2 * k2q + 2 * k3q + k4q)
        v = v + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
        return q, v

    e0 = sum(algos.energy(tree, q, v))
    for _ in range(2000):
        q, v = rk4_step(q, v)
    e1 = sum(algos.energy(tree, q, v))
    assert abs(float(e1 - e0)) < 1e-3


def test_vmap_jit_aba():
    tree = make_cartpole()
    B = 64
    q = jnp.tile(tree.neutral_q(), (B, 1)).at[:, 1].add(
        jnp.linspace(-0.1, 0.1, B)
    )
    v = jnp.zeros((B, tree.nv))
    tau = jnp.zeros((B, tree.nv))
    f = jax.jit(jax.vmap(lambda q, v, t: algos.aba(tree, q, v, t)))
    a = f(q, v, tau)
    assert a.shape == (B, tree.nv)
    # each batch element must match the unbatched call
    a0 = algos.aba(tree, q[0], v[0], tau[0])
    np.testing.assert_allclose(a[0], a0, atol=1e-5)


def test_point_jacobian_matches_fd():
    tree = make_double_pendulum()
    q, _ = rand_state(tree, seed=31)
    xw = algos.forward_kinematics(tree, q)
    poses, _ = algos.frame_kinematics(tree, xw)
    tip_body = tree.frame_body[tree.frame_index("tip")]
    p = poses[tree.frame_index("tip")].pos
    J = algos.point_jacobian(tree, xw, tip_body, p)

    def tip_pos(qq):
        xw2 = algos.forward_kinematics(tree, qq)
        poses2, _ = algos.frame_kinematics(tree, xw2)
        return poses2[tree.frame_index("tip")].pos

    Jfd = jax.jacobian(tip_pos)(q)
    np.testing.assert_allclose(J, Jfd, atol=1e-4)
