"""Toy models mirroring the reference's ``data/toys_models`` assets
(simple_pendulum, cartpole, acrobot — SURVEY.md §1 "Assets", §2.5 envs).

All built programmatically with :class:`TreeBuilder`; geometry matches the
classic Gym/Jiminy parameterizations so analytical fixtures apply.
"""

from __future__ import annotations

import numpy as np

from jiminy_tpu.core.tree import JointType, KinematicTree, TreeBuilder


def make_pendulum(
    length: float = 1.0,
    mass: float = 1.0,
    point_mass: bool = True,
    armature: float = 0.0,
    damping: float = 0.0,
) -> KinematicTree:
    """Single pendulum rotating about world y-axis; θ=0 hangs down (-z).

    With a point mass at distance L: q̈ = -(g/L)·sin(θ) — the analytical
    fixture used by the reference's test_simple_pendulum (SURVEY.md §4)."""
    b = TreeBuilder()
    inertia = np.zeros((3, 3), np.float32)
    if not point_mass:
        # thin rod about its CoM
        inertia = np.diag([mass * length**2 / 12.0] * 2 + [0.0]).astype(np.float32)
        com = (0.0, 0.0, -length / 2.0)
    else:
        com = (0.0, 0.0, -length)
    b.add_body(
        "link",
        parent=-1,
        joint_type=JointType.REVOLUTE,
        axis=(0.0, 1.0, 0.0),
        mass=mass,
        com=com,
        inertia=inertia,
        armature=armature,
        damping=damping,
        joint_name="pivot",
    )
    b.add_frame("tip", 0, TreeBuilder.make_placement(pos=(0, 0, -length)))
    b.add_contact_point("tip_contact", 0, (0.0, 0.0, -length))
    return b.build()


def make_double_pendulum(
    l1: float = 1.0, l2: float = 1.0, m1: float = 1.0, m2: float = 1.0
) -> KinematicTree:
    """Two-link pendulum (point masses), both about y, hanging down."""
    b = TreeBuilder()
    j1 = b.add_body(
        "link1",
        parent=-1,
        joint_type=JointType.REVOLUTE,
        axis=(0, 1, 0),
        mass=m1,
        com=(0, 0, -l1),
        joint_name="shoulder",
    )
    b.add_body(
        "link2",
        parent=j1,
        joint_type=JointType.REVOLUTE,
        placement=TreeBuilder.make_placement(pos=(0, 0, -l1)),
        axis=(0, 1, 0),
        mass=m2,
        com=(0, 0, -l2),
        joint_name="elbow",
    )
    b.add_frame("tip", 1, TreeBuilder.make_placement(pos=(0, 0, -l2)))
    return b.build()


def make_cartpole(
    cart_mass: float = 1.0,
    pole_mass: float = 0.1,
    pole_length: float = 0.5,
    x_limit: float = 2.4,
) -> KinematicTree:
    """Classic cartpole: prismatic cart along x + pole about y, θ=0 upright.

    Matches the Gym/Jiminy CartPole parameterization (reference env
    ``CartPoleJiminyEnv``, SURVEY.md §2.5): pole modeled as a point mass at
    the half-length ``pole_length`` (Gym's convention: l = half-pole)."""
    b = TreeBuilder()
    cart = b.add_body(
        "cart",
        parent=-1,
        joint_type=JointType.PRISMATIC,
        axis=(1, 0, 0),
        mass=cart_mass,
        com=(0, 0, 0),
        joint_name="slider",
        q_limits=(-x_limit, x_limit),
        u_max=30.0,
    )
    b.add_body(
        "pole",
        parent=cart,
        joint_type=JointType.REVOLUTE,
        axis=(0, 1, 0),
        mass=pole_mass,
        com=(0, 0, pole_length),  # θ=0 ⇒ pole up (+z)
        joint_name="pole_hinge",
    )
    b.add_frame("pole_tip", 1, TreeBuilder.make_placement(pos=(0, 0, pole_length)))
    return b.build()


def make_acrobot(
    l1: float = 1.0,
    l2: float = 1.0,
    m1: float = 1.0,
    m2: float = 1.0,
    lc1: float = 0.5,
    lc2: float = 0.5,
    I1: float = 1.0,
    I2: float = 1.0,
) -> KinematicTree:
    """Acrobot (Sutton/Gym parameterization): two links about y, actuated at
    the elbow only; θ=0 hangs down. Reference env ``AcrobotJiminyEnv``
    (SURVEY.md §2.5). I1/I2 are link inertias about their CoM."""
    b = TreeBuilder()
    j1 = b.add_body(
        "upper_arm",
        parent=-1,
        joint_type=JointType.REVOLUTE,
        axis=(0, 1, 0),
        mass=m1,
        com=(0, 0, -lc1),
        inertia=np.diag([I1, I1, 0.0]).astype(np.float32),
        joint_name="shoulder",
    )
    b.add_body(
        "lower_arm",
        parent=j1,
        joint_type=JointType.REVOLUTE,
        placement=TreeBuilder.make_placement(pos=(0, 0, -l1)),
        axis=(0, 1, 0),
        mass=m2,
        com=(0, 0, -lc2),
        inertia=np.diag([I2, I2, 0.0]).astype(np.float32),
        joint_name="elbow",
        u_max=10.0,
    )
    b.add_frame("tip", 1, TreeBuilder.make_placement(pos=(0, 0, -l2)))
    return b.build()


def make_ball(mass: float = 1.0, radius: float = 0.1) -> KinematicTree:
    """Free-floating solid sphere with ONE collision-sphere contact site
    at its center — the rolling-contact fixture. The contact point is
    recomputed each substep at center − r·n̂, so its Jacobian carries the
    ω×(−r·n̂) lever arm and Coulomb friction makes the ball roll (slide →
    roll transition: v∞ = 5/7·v₀ for a solid sphere)."""
    i = 0.4 * mass * radius * radius  # solid sphere: 2/5 m r²
    b = TreeBuilder()
    ball = b.add_body(
        "ball",
        parent=-1,
        joint_type=JointType.FREE,
        mass=mass,
        com=(0, 0, 0),
        inertia=np.diag([i, i, i]).astype(np.float32),
        joint_name="root",
    )
    b.add_contact_sphere("surface", ball, (0.0, 0.0, 0.0), radius=radius)
    return b.build()


def make_free_box(
    mass: float = 1.0, half_extents=(0.1, 0.1, 0.1)
) -> KinematicTree:
    """Free-floating box with corner contact points — contact-model fixture."""
    hx, hy, hz = half_extents
    ix = mass / 3.0 * (hy**2 + hz**2)
    iy = mass / 3.0 * (hx**2 + hz**2)
    iz = mass / 3.0 * (hx**2 + hy**2)
    b = TreeBuilder()
    box = b.add_body(
        "box",
        parent=-1,
        joint_type=JointType.FREE,
        mass=mass,
        com=(0, 0, 0),
        inertia=np.diag([ix, iy, iz]).astype(np.float32),
        joint_name="root",
    )
    for cx in (-hx, hx):
        for cy in (-hy, hy):
            for cz in (-hz, hz):
                b.add_contact_point(
                    f"corner_{cx:+.2f}_{cy:+.2f}_{cz:+.2f}", box, (cx, cy, cz)
                )
    return b.build()
