"""MJCF/URDF model ingestion (VERDICT r2 item 2).

The MJCF parser is validated against MuJoCo itself on the *vendored*
reference workload (``dual-FFSR_ProxDDP/xml/dual_arm_space_robot.xml``,
which the reference loads via ``pin.buildModelsFromMJCF`` at
``dual-FFSR_ProxDDP/main.py:28``): world kinematics of every body/site and
the joint-space mass matrix must match numerically. The URDF parser is
checked against a hand-built model and internal dynamics identities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu.modelling.multibody import mjcf, urdf
from aligator_tpu.modelling.multibody import model as rbd

FFSR_XML = "/root/reference/dual-FFSR_ProxDDP/xml/dual_arm_space_robot.xml"

needs_ffsr_xml = pytest.mark.skipif(
    not os.path.exists(FFSR_XML), reason="vendored MJCF not available"
)


@needs_ffsr_xml
def test_mjcf_structure():
    m, info = mjcf.load_mjcf(FFSR_XML)
    # 14 hinge arm joints + the free grasp object; 5000kg bus welded to world
    assert m.njoints == 15
    assert m.joint_types.count("revolute") == 14
    assert m.joint_types.count("freeflyer") == 1
    assert info["joint_names"][:2] == ("joint1_1", "joint1_2")
    assert "grip1" in m.frame_names and "grip2" in m.frame_names
    assert np.allclose(info["gravity"], 0.0)
    assert np.all(info["armature"][:14] == 10.0)
    assert np.all(info["damping"][:14] == 10.0)
    assert info["actuated_dofs"] == tuple(range(14))
    # real masses from the file
    assert float(m.mass[0]) == pytest.approx(5.0169)
    assert float(m.mass[2]) == pytest.approx(51.2952)


@needs_ffsr_xml
def test_mjcf_kinematics_vs_mujoco():
    mujoco = pytest.importorskip("mujoco")
    mj = mujoco.MjModel.from_xml_path(FFSR_XML)
    d = mujoco.MjData(mj)

    m, info = mjcf.load_mjcf(FFSR_XML, skip_bodies=("object",))
    rng = np.random.default_rng(0)
    q_arm = rng.uniform(-1.0, 1.0, size=14)

    # our model: 14 hinge dofs in document order
    q = jnp.asarray(q_arm)
    kin = rbd.kinematics(m, q)

    # mujoco: map by joint name into qpos
    for jn, qi in zip(info["joint_names"], q_arm):
        d.qpos[mj.joint(jn).qposadr[0]] = qi
    mujoco.mj_forward(mj, d)

    # every arm body position + orientation matches
    for b in range(mj.nbody):
        name = mj.body(b).name
        if name in ("world", "chasersat", "object"):
            continue
        fid = m.frame_names.index(name)
        R, p = rbd.frame_placement(m, q, fid, kin=kin)
        assert np.allclose(np.asarray(p), d.xpos[b], atol=1e-10), name
        xmat = d.xmat[b].reshape(3, 3)
        assert np.allclose(np.asarray(R), xmat, atol=1e-10), name
    # sites too (incl. the grip tool frames)
    for s in range(mj.nsite):
        name = mj.site(s).name
        if name not in m.frame_names:
            continue
        fid = m.frame_names.index(name)
        _, p = rbd.frame_placement(m, q, fid, kin=kin)
        assert np.allclose(np.asarray(p), d.site_xpos[s], atol=1e-10), name


@needs_ffsr_xml
def test_mjcf_mass_matrix_vs_mujoco():
    mujoco = pytest.importorskip("mujoco")
    mj = mujoco.MjModel.from_xml_path(FFSR_XML)
    d = mujoco.MjData(mj)

    m, info = mjcf.load_mjcf(FFSR_XML, skip_bodies=("object",))
    rng = np.random.default_rng(1)
    q_arm = rng.uniform(-1.0, 1.0, size=14)
    for jn, qi in zip(info["joint_names"], q_arm):
        d.qpos[mj.joint(jn).qposadr[0]] = qi
    mujoco.mj_forward(mj, d)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, Mfull)
    # arm dofs of the mujoco model, in our document order
    idx = [mj.joint(jn).dofadr[0] for jn in info["joint_names"]]
    M_mj = Mfull[np.ix_(idx, idx)]

    M_ours = np.asarray(rbd.mass_matrix(m, jnp.asarray(q_arm)))
    assert np.allclose(M_ours, M_mj, rtol=1e-8, atol=1e-10)


@needs_ffsr_xml
def test_mjcf_freeflyer_base_momentum_conservation():
    """With root_joint='freeflyer' the bus is free: in zero g with no
    actuation, whole-body momentum is conserved under simulation."""
    from aligator_tpu.modelling.multibody.extra_residuals import (
        centroidal_momentum,
    )

    m, _ = mjcf.load_mjcf(FFSR_XML, root_joint="freeflyer",
                          skip_bodies=("object",))
    assert m.nv == 20 and float(m.mass[0]) == 5000.0
    q = m.neutral()
    v = 0.05 * jnp.ones(m.nv)
    h0 = centroidal_momentum(m, q, v)
    dt = 1e-3
    cspace = m.configuration_space()
    for _ in range(10):
        a = rbd.aba(m, q, v, jnp.zeros(m.nv))
        q = cspace.integrate(q, dt * v)
        v = v + dt * a
    h1 = centroidal_momentum(m, q, v)
    # linear momentum exactly conserved; angular to integrator order
    assert np.allclose(np.asarray(h1[:3]), np.asarray(h0[:3]), atol=1e-8)
    assert np.allclose(np.asarray(h1[3:]), np.asarray(h0[3:]), atol=1e-3)


URDF_2LINK = """
<robot name="twolink">
  <link name="base">
    <inertial><origin xyz="0 0 0"/><mass value="1.0"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l1">
    <inertial><origin xyz="0 0 -0.25" rpy="0 0 0"/><mass value="2.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l2">
    <inertial><origin xyz="0 0 -0.2"/><mass value="1.5"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.005" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="tool"/>
  <joint name="j1" type="continuous">
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="base"/><child link="l1"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.5"/>
  </joint>
  <joint name="j2" type="revolute">
    <origin xyz="0 0 -0.5" rpy="0 0 0"/>
    <parent link="l1"/><child link="l2"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" effort="50"/>
  </joint>
  <joint name="jt" type="fixed">
    <origin xyz="0 0 -0.4"/>
    <parent link="l2"/><child link="tool"/>
  </joint>
</robot>
"""


def test_urdf_two_link_pendulum():
    m, info = urdf.load_urdf(URDF_2LINK)
    assert m.njoints == 2
    assert info["joint_names"] == ("j1", "j2")
    assert info["limits"]["j2"]["upper"] == 2.0
    assert info["damping"][0] == 0.5
    # base link welded to world: its 1kg never enters the dynamics
    assert np.allclose(np.asarray(m.mass), [2.0, 1.5])

    # tool frame (through the fixed joint) at q=0 hangs at z=-0.9
    q = jnp.zeros(2)
    _, p = rbd.frame_placement(m, q, m.frame_names.index("tool"))
    assert np.allclose(np.asarray(p), [0.0, 0.0, -0.9], atol=1e-12)

    # energy consistency: pendulum swing conserves E under small steps
    v = jnp.zeros(2)
    q = jnp.array([1.0, 0.5])

    def energy(q, v):
        M = rbd.mass_matrix(m, q)
        kin = rbd.kinematics(m, q)
        c_w = kin["p"] + jnp.einsum("nij,nj->ni", kin["R"], m.com)
        pot = -jnp.sum(m.mass * (c_w @ m.gravity))
        return 0.5 * v @ M @ v + pot

    e0 = float(energy(q, v))
    dt = 1e-4
    for _ in range(50):
        a = rbd.aba(m, q, v, jnp.zeros(2))
        q = q + dt * v + 0.5 * dt * dt * a
        v = v + dt * a
    assert float(energy(q, v)) == pytest.approx(e0, abs=1e-4)


def test_urdf_freeflyer_root():
    m, info = urdf.load_urdf(URDF_2LINK, root_joint="freeflyer")
    assert m.joint_types[0] == "freeflyer"
    assert m.njoints == 3 and m.nv == 8
    # the base link's inertia now belongs to the free-flyer joint
    assert float(m.mass[0]) == 1.0
    # zero-torque fall in gravity: CoM acceleration = g
    q = m.neutral()
    v = jnp.zeros(m.nv)
    a = rbd.aba(m, q, v, jnp.zeros(m.nv))
    # free-flyer linear acceleration (body frame = world at neutral)
    assert np.allclose(np.asarray(a[:3]), [0.0, 0.0, -9.81], atol=1e-9)


def test_mjcf_inline_defaults_and_geom_inertia():
    """Defaults class merging, degree angles, and density-based geom
    inertia for a body without <inertial> — checked against MuJoCo."""
    xml = """
<mujoco model="mini">
  <compiler angle="degree"/>
  <default>
    <joint damping="2.5" armature="0.1"/>
    <default class="stiff"><joint damping="7.0"/></default>
  </default>
  <worldbody>
    <body name="b1" pos="0 0 1" euler="0 0 90">
      <joint name="h1" axis="0 1 0"/>
      <geom type="box" size="0.1 0.2 0.3" density="500"/>
      <body name="b2" pos="0.5 0 0">
        <joint name="h2" class="stiff" axis="1 0 0"/>
        <geom type="sphere" size="0.2"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    m, info = mjcf.load_mjcf(path)
    assert info["damping"].tolist() == [2.5, 7.0]
    assert info["armature"].tolist() == [0.1, 0.1]
    # box inertia from density 500: m = 500*8*0.1*0.2*0.3 = 24
    assert float(m.mass[0]) == pytest.approx(24.0)

    mujoco = pytest.importorskip("mujoco")
    mj = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(mj)
    q = np.array([0.7, -0.3])
    d.qpos[:] = q
    import mujoco as mjlib

    mjlib.mj_forward(mj, d)
    kin = rbd.kinematics(m, jnp.asarray(q))
    for b in range(mj.nbody):
        name = mj.body(b).name
        if name == "world":
            continue
        fid = m.frame_names.index(name)
        R, p = rbd.frame_placement(m, jnp.asarray(q), fid, kin=kin)
        assert np.allclose(np.asarray(p), d.xpos[b], atol=1e-10), name
        assert np.allclose(
            np.asarray(R), d.xmat[b].reshape(3, 3), atol=1e-8
        ), name
    Mfull = np.zeros((2, 2))
    mjlib.mj_fullM(mj, d, Mfull)
    M_ours = np.asarray(rbd.mass_matrix(m, jnp.asarray(q)))
    assert np.allclose(M_ours, Mfull, rtol=1e-6, atol=1e-8)
    os.unlink(path)
