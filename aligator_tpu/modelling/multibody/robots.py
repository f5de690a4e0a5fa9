"""Built-in robot models (no external model files needed).

These are hand-authored descriptions: an analytic double pendulum used for
validation against closed-form dynamics, a planar quadrotor-like free-flyer,
and a UR5-like 6-DOF arm built from the publicly documented nominal
kinematic/inertial parameters of the UR5 (role of the reference's
``examples/ur5_reach.py`` model, which loads it from example-robot-data).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .model import FREEFLYER, REVOLUTE, RobotModel, make_model


def _rpy_quat(r, p, y):
    """Quaternion (x,y,z,w) from roll-pitch-yaw (URDF convention)."""
    cr, sr = jnp.cos(r / 2), jnp.sin(r / 2)
    cp, sp = jnp.cos(p / 2), jnp.sin(p / 2)
    cy, sy = jnp.cos(y / 2), jnp.sin(y / 2)
    return jnp.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def make_double_pendulum(l1=1.0, l2=1.0, m1=1.0, m2=1.0) -> RobotModel:
    """Planar double pendulum: two revolute joints about +y, point masses at
    the link tips, hanging along −z at q = 0."""
    eps = 1e-8  # tiny rotational inertia keeps M(q) well-conditioned
    joints = [
        dict(
            type=REVOLUTE,
            parent=-1,
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=m1,
            com=jnp.array([0.0, 0.0, -l1]),
            inertia=eps * jnp.eye(3),
        ),
        dict(
            type=REVOLUTE,
            parent=0,
            placement_p=jnp.array([0.0, 0.0, -l1]),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=m2,
            com=jnp.array([0.0, 0.0, -l2]),
            inertia=eps * jnp.eye(3),
        ),
    ]
    frames = [
        dict(name="tip", parent=1, placement_p=jnp.array([0.0, 0.0, -l2])),
    ]
    return make_model(joints, frames)


def make_pendulum(l=1.0, m=1.0) -> RobotModel:
    joints = [
        dict(
            type=REVOLUTE,
            parent=-1,
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=m,
            com=jnp.array([0.0, 0.0, -l]),
            inertia=1e-8 * jnp.eye(3),
        )
    ]
    frames = [dict(name="tip", parent=0, placement_p=jnp.array([0.0, 0.0, -l]))]
    return make_model(joints, frames)


def make_ur5() -> RobotModel:
    """UR5-like 6-DOF arm from nominal public UR5 parameters
    (kinematics per the UR5 URDF chain; inertias are the published
    link masses with standard CoM offsets)."""
    half_pi = jnp.pi / 2

    def diag(x, y, z):
        return jnp.diag(jnp.array([x, y, z]))

    joints = [
        # shoulder_pan (about z)
        dict(
            type=REVOLUTE, parent=-1,
            placement_p=jnp.array([0.0, 0.0, 0.089159]),
            axis=jnp.array([0.0, 0.0, 1.0]),
            mass=3.7, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0103, 0.0103, 0.0067),
        ),
        # shoulder_lift (about y)
        dict(
            type=REVOLUTE, parent=0,
            placement_p=jnp.array([0.0, 0.13585, 0.0]),
            placement_q=_rpy_quat(0.0, half_pi, 0.0),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=8.393, com=jnp.array([0.0, 0.0, 0.28]),
            inertia=diag(0.2269, 0.2269, 0.0151),
        ),
        # elbow (about y)
        dict(
            type=REVOLUTE, parent=1,
            placement_p=jnp.array([0.0, -0.1197, 0.425]),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=2.275, com=jnp.array([0.0, 0.0, 0.25]),
            inertia=diag(0.0494, 0.0494, 0.0041),
        ),
        # wrist_1 (about y)
        dict(
            type=REVOLUTE, parent=2,
            placement_p=jnp.array([0.0, 0.0, 0.39225]),
            placement_q=_rpy_quat(0.0, half_pi, 0.0),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=1.219, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0111, 0.0111, 0.0022),
        ),
        # wrist_2 (about z)
        dict(
            type=REVOLUTE, parent=3,
            placement_p=jnp.array([0.0, 0.093, 0.0]),
            axis=jnp.array([0.0, 0.0, 1.0]),
            mass=1.219, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0111, 0.0111, 0.0022),
        ),
        # wrist_3 (about y)
        dict(
            type=REVOLUTE, parent=4,
            placement_p=jnp.array([0.0, 0.0, 0.09465]),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=0.1879, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.00033, 0.00033, 0.00021),
        ),
    ]
    frames = [
        dict(
            name="ee",
            parent=5,
            placement_p=jnp.array([0.0, 0.0823, 0.0]),
            placement_q=_rpy_quat(0.0, 0.0, half_pi),
        ),
    ]
    return make_model(joints, frames)


def make_ur10() -> RobotModel:
    """UR10-like 6-DOF arm from nominal public UR10 parameters
    (ur_description URDF chain: d1=0.1273, shoulder/elbow offsets, upper-arm
    0.612 m, forearm 0.5723 m, wrist lengths; published link masses). Role
    of the reference's ``examples/ur10_midpoint.py`` / ``ur10_ballistic.py``
    model (loaded there from example-robot-data as ``ur10_limited``)."""
    half_pi = jnp.pi / 2

    def diag(x, y, z):
        return jnp.diag(jnp.array([x, y, z]))

    joints = [
        # shoulder_pan (about z)
        dict(
            type=REVOLUTE, parent=-1,
            placement_p=jnp.array([0.0, 0.0, 0.1273]),
            axis=jnp.array([0.0, 0.0, 1.0]),
            mass=7.778, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0315, 0.0315, 0.0219),
        ),
        # shoulder_lift (about y); upper arm, 0.612 m
        dict(
            type=REVOLUTE, parent=0,
            placement_p=jnp.array([0.0, 0.220941, 0.0]),
            placement_q=_rpy_quat(0.0, half_pi, 0.0),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=12.93, com=jnp.array([0.0, 0.0, 0.306]),
            inertia=diag(0.4218, 0.4218, 0.0364),
        ),
        # elbow (about y); forearm, 0.5723 m
        dict(
            type=REVOLUTE, parent=1,
            placement_p=jnp.array([0.0, -0.1719, 0.612]),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=3.87, com=jnp.array([0.0, 0.0, 0.28615]),
            inertia=diag(0.1110, 0.1110, 0.0109),
        ),
        # wrist_1 (about y)
        dict(
            type=REVOLUTE, parent=2,
            placement_p=jnp.array([0.0, 0.0, 0.5723]),
            placement_q=_rpy_quat(0.0, half_pi, 0.0),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=1.96, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0051, 0.0051, 0.0055),
        ),
        # wrist_2 (about z)
        dict(
            type=REVOLUTE, parent=3,
            placement_p=jnp.array([0.0, 0.1149, 0.0]),
            axis=jnp.array([0.0, 0.0, 1.0]),
            mass=1.96, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.0051, 0.0051, 0.0055),
        ),
        # wrist_3 (about y)
        dict(
            type=REVOLUTE, parent=4,
            placement_p=jnp.array([0.0, 0.0, 0.1157]),
            axis=jnp.array([0.0, 1.0, 0.0]),
            mass=0.202, com=jnp.array([0.0, 0.0, 0.0]),
            inertia=diag(0.00053, 0.00053, 0.00069),
        ),
    ]
    frames = [
        dict(
            name="ee",
            parent=5,
            placement_p=jnp.array([0.0, 0.0922, 0.0]),
            placement_q=_rpy_quat(0.0, 0.0, half_pi),
        ),
    ]
    return make_model(joints, frames)


def ur10_effort_limits():
    """Published UR10 per-joint torque limits (ur_description)."""
    return jnp.array([330.0, 330.0, 150.0, 54.0, 54.0, 54.0])


def make_panda() -> RobotModel:
    """Franka Emika Panda-like 7-DOF arm from the publicly documented
    nominal kinematics (franka_description URDF joint origins, all joint
    axes +z in the child frame) and the published identified link masses /
    CoM offsets (Gaz et al. 2019); rotational inertias are simplified
    cylinder-scale values. Role of the reference's Panda example model
    (``examples/panda_mujoco_test_se3_collision.py``, loaded there via
    MuJoCo/example-robot-data)."""
    half_pi = jnp.pi / 2
    z = jnp.array([0.0, 0.0, 1.0])

    def inert(m, s=0.06):
        # solid-cylinder-scale inertia about the CoM
        return m * jnp.diag(jnp.array([s * s, s * s, 0.5 * s * s]))

    joints = [
        # joint1: link0 -> link1, origin z=0.333
        dict(
            type=REVOLUTE, parent=-1,
            placement_p=jnp.array([0.0, 0.0, 0.333]),
            axis=z, mass=4.970684,
            com=jnp.array([0.003875, 0.002081, -0.04762]),
            inertia=inert(4.970684, 0.08),
        ),
        # joint2: rpy=(-pi/2,0,0)
        dict(
            type=REVOLUTE, parent=0,
            placement_q=_rpy_quat(-half_pi, 0.0, 0.0),
            axis=z, mass=0.646926,
            com=jnp.array([-0.003141, -0.02872, 0.003495]),
            inertia=inert(0.646926, 0.07),
        ),
        # joint3: xyz=(0,-0.316,0), rpy=(pi/2,0,0)
        dict(
            type=REVOLUTE, parent=1,
            placement_p=jnp.array([0.0, -0.316, 0.0]),
            placement_q=_rpy_quat(half_pi, 0.0, 0.0),
            axis=z, mass=3.228604,
            com=jnp.array([0.027518, 0.039252, -0.066502]),
            inertia=inert(3.228604, 0.07),
        ),
        # joint4: xyz=(0.0825,0,0), rpy=(pi/2,0,0)
        dict(
            type=REVOLUTE, parent=2,
            placement_p=jnp.array([0.0825, 0.0, 0.0]),
            placement_q=_rpy_quat(half_pi, 0.0, 0.0),
            axis=z, mass=3.587895,
            com=jnp.array([-0.05317, 0.104419, 0.027454]),
            inertia=inert(3.587895, 0.07),
        ),
        # joint5: xyz=(-0.0825,0.384,0), rpy=(-pi/2,0,0)
        dict(
            type=REVOLUTE, parent=3,
            placement_p=jnp.array([-0.0825, 0.384, 0.0]),
            placement_q=_rpy_quat(-half_pi, 0.0, 0.0),
            axis=z, mass=1.225946,
            com=jnp.array([-0.011953, 0.041065, -0.038437]),
            inertia=inert(1.225946, 0.06),
        ),
        # joint6: rpy=(pi/2,0,0)
        dict(
            type=REVOLUTE, parent=4,
            placement_q=_rpy_quat(half_pi, 0.0, 0.0),
            axis=z, mass=1.666555,
            com=jnp.array([0.060149, -0.014117, -0.010517]),
            inertia=inert(1.666555, 0.06),
        ),
        # joint7: xyz=(0.088,0,0), rpy=(pi/2,0,0)
        dict(
            type=REVOLUTE, parent=5,
            placement_p=jnp.array([0.088, 0.0, 0.0]),
            placement_q=_rpy_quat(half_pi, 0.0, 0.0),
            axis=z, mass=0.735522,
            com=jnp.array([0.010517, -0.004252, 0.061597]),
            inertia=inert(0.735522, 0.05),
        ),
    ]
    frames = [
        # flange ("panda_link8" / attachment frame): z offset 0.107 from j7
        dict(name="ee", parent=6, placement_p=jnp.array([0.0, 0.0, 0.107])),
        dict(name="elbow", parent=3),
    ]
    return make_model(joints, frames)


# Real vendored Panda asset (reference tree: the MJCF the reference's
# manipulator examples load via pin.RobotWrapper.BuildFromMJCF,
# ``examples/panda_mujoco_test_se3_collision.py:44``). Parsed at runtime —
# not copied into this repo.
PANDA_MJCF_PATH = "/root/reference/franka_emika_panda/panda_nohand.xml"


def make_panda_real(path: str = None):
    """The *real* Franka Emika Panda (7-DOF, no hand), ingested from the
    vendored MJCF through :mod:`.mjcf` — real kinematic frames, identified
    masses/CoMs/full rotational inertias and per-joint armature, validated
    against MuJoCo in ``tests/test_panda_ingestion.py`` (FK ~1e-15,
    mass matrix/RNEA ~1e-8). Frames: link1..7, ``attachment`` (flange,
    aliased as ``ee``) and ``elbow`` (= link4 body frame, the alias used by
    the reach example's collision pairs).

    Returns ``(model, info)``; raises ``FileNotFoundError`` when the asset
    is unavailable (callers fall back to :func:`make_panda`, the nominal
    approximation)."""
    import os

    from .mjcf import load_mjcf
    from .model import with_frame

    p = PANDA_MJCF_PATH if path is None else path
    if not os.path.exists(p):
        raise FileNotFoundError(p)
    model, info = load_mjcf(p)
    model = with_frame(
        model, "ee", model.frame_parents[model.frame_id("attachment")],
        placement_p=model.fplac_p[model.frame_id("attachment")],
        placement_q=model.fplac_q[model.frame_id("attachment")],
    )
    model = with_frame(model, "elbow", 3)
    return model, info


# numpy (not jnp) so importing the module never initializes a jax backend
PANDA_Q_HOME = np.array([0.0, -0.785398, 0.0, -2.356194, 0.0, 1.570796, 0.785398])
PANDA_EFFORT_LIMIT = np.array([87.0, 87.0, 87.0, 87.0, 12.0, 12.0, 12.0])
PANDA_Q_LOWER = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973]
)
PANDA_Q_UPPER = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973]
)


def make_dual_arm_ffsr(
    base_mass=60.0,
    base_half=(0.35, 0.45, 0.25),
    mount_y=0.45,
    mount_z=0.15,
) -> RobotModel:
    """Dual-arm free-floating space robot (FFSR): free-flyer base bus with
    two 7-DOF Panda-kinematics arms mounted on its ±y faces, zero gravity.

    Role of the reference fork's vendored application workload
    (``dual-FFSR_ProxDDP/main3.py``: pin.buildModelsFromMJCF of
    ``xml/dual_arm_space_robot.xml``, ``pin_model.gravity.linear[:] = 0``,
    nq = 7 + 14, nv = 6 + 14, base unactuated). The arm chains reuse the
    published Panda nominal kinematics/inertials (see :func:`make_panda`);
    each arm's base frame is rotated so its first joint axis points along
    the world ±y at the neutral base attitude.
    """
    half_pi = jnp.pi / 2
    z = jnp.array([0.0, 0.0, 1.0])
    lx, ly, lz = base_half

    def box_inertia(m, hx, hy, hz):
        return (m / 3.0) * jnp.diag(
            jnp.array([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])
        )

    joints = [
        dict(
            type=FREEFLYER, parent=-1,
            mass=base_mass, com=jnp.zeros(3),
            inertia=box_inertia(base_mass, lx, ly, lz),
        )
    ]
    frames = []

    # Panda chain (relative placements & identified inertials, as in
    # make_panda); per-joint (placement_p, rpy, mass, com, s):
    chain = [
        (jnp.array([0.0, 0.0, 0.333]), (0.0, 0.0, 0.0),
         4.970684, jnp.array([0.003875, 0.002081, -0.04762]), 0.08),
        (jnp.zeros(3), (-half_pi, 0.0, 0.0),
         0.646926, jnp.array([-0.003141, -0.02872, 0.003495]), 0.07),
        (jnp.array([0.0, -0.316, 0.0]), (half_pi, 0.0, 0.0),
         3.228604, jnp.array([0.027518, 0.039252, -0.066502]), 0.07),
        (jnp.array([0.0825, 0.0, 0.0]), (half_pi, 0.0, 0.0),
         3.587895, jnp.array([-0.05317, 0.104419, 0.027454]), 0.07),
        (jnp.array([-0.0825, 0.384, 0.0]), (-half_pi, 0.0, 0.0),
         1.225946, jnp.array([-0.011953, 0.041065, -0.038437]), 0.06),
        (jnp.zeros(3), (half_pi, 0.0, 0.0),
         1.666555, jnp.array([0.060149, -0.014117, -0.010517]), 0.06),
        (jnp.array([0.088, 0.0, 0.0]), (half_pi, 0.0, 0.0),
         0.735522, jnp.array([0.010517, -0.004252, 0.061597]), 0.05),
    ]

    def inert(m, s):
        return m * jnp.diag(jnp.array([s * s, s * s, 0.5 * s * s]))

    for k, (name, sy) in enumerate((("arm1", +1.0), ("arm2", -1.0))):
        parent = 0  # base
        for i, (pp, rpy, mass, com, s) in enumerate(chain):
            d = dict(
                type=REVOLUTE, parent=parent, axis=z,
                mass=mass, com=com, inertia=inert(mass, s),
            )
            if i == 0:
                # mount on the ±y face, first joint axis along world ±y
                d["placement_p"] = jnp.array([0.0, sy * mount_y, mount_z])
                d["placement_q"] = _rpy_quat(-sy * half_pi, 0.0, 0.0)
            else:
                d["placement_p"] = pp
                r, p_, y_ = rpy
                d["placement_q"] = _rpy_quat(r, p_, y_)
            joints.append(d)
            parent = len(joints) - 1
        frames.append(
            dict(
                name=f"{name}_tool", parent=parent,
                placement_p=jnp.array([0.0, 0.0, 0.107]),
            )
        )
    frames.append(dict(name="base", parent=0))
    return make_model(joints, frames, gravity=(0.0, 0.0, 0.0))


# nominal arm postures from the vendored application
# (dual-FFSR_ProxDDP/main3.py desired_qpos_arm1/arm2)
FFSR_Q_ARM1 = np.array([-1.6591, -0.8973, -0.2357, 1.1626, -1.9025, -0.5507, 0.8034])
FFSR_Q_ARM2 = np.array([-2.209, -0.5691, 0.3233, 1.1195, -2.0471, -0.0263, 0.7434])


def make_free_sphere(mass=1.0, radius=0.2) -> RobotModel:
    """Free-floating rigid body (validation of free-flyer dynamics:
    momentum conservation, ballistic CoM)."""
    I = (2.0 / 5.0) * mass * radius**2
    joints = [
        dict(
            type=FREEFLYER, parent=-1,
            mass=mass, com=jnp.zeros(3), inertia=I * jnp.eye(3),
        )
    ]
    frames = [dict(name="center", parent=0)]
    return make_model(joints, frames)


def make_ur10_with_payload(mass=0.5, radius=0.05, height=0.12) -> RobotModel:
    """UR10 arm + a free-flying cylindrical payload ("mug") as ONE model —
    a forest with two roots (the arm base and the payload free-flyer).

    Role of the reference ``examples/ur10_ballistic.py``'s composite model
    (``append_ball_to_robot_model``: ``pin.appendModel`` of the arm and a
    free-flyer mug URDF, ur10_ballistic.py:66-105).  The grasp is a 6D
    body-body loop constraint between the ``ee`` frame and the ``mug``
    frame (``contact.py`` ``contact_frames2``); release = deactivating the
    constraint through the stage-stacked ``active`` schedule — the
    framework's shape-static answer to the reference's two dynamics
    objects.

    The payload is a solid cylinder (axis z): Izz = m r²/2,
    Ixx = Iyy = m (3r² + h²)/12.
    """
    base = make_ur10()
    Ixx = mass * (3 * radius**2 + height**2) / 12.0
    Izz = mass * radius**2 / 2.0
    joints = [
        dict(
            type=base.joint_types[i], parent=base.parents[i],
            placement_p=base.jplac_p[i], placement_q=base.jplac_q[i],
            axis=base.axes[i], mass=base.mass[i], com=base.com[i],
            inertia=base.inertia[i],
        )
        for i in range(len(base.joint_types))
    ]
    joints.append(
        dict(
            type=FREEFLYER, parent=-1,
            mass=mass, com=jnp.zeros(3),
            inertia=jnp.diag(jnp.array([Ixx, Ixx, Izz])),
        )
    )
    frames = [
        dict(
            name=base.frame_names[i], parent=base.frame_parents[i],
            placement_p=base.fplac_p[i], placement_q=base.fplac_q[i],
        )
        for i in range(len(base.frame_names))
    ]
    frames.append(dict(name="mug", parent=len(joints) - 1))
    return make_model(joints, frames)
