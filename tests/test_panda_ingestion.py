"""Real-Panda MJCF ingestion parity vs MuJoCo (round-4 VERDICT item 2).

The vendored asset ``franka_emika_panda/panda_nohand.xml`` (the exact file
the reference's manipulator examples load,
``examples/panda_mujoco_test_se3_collision.py:44``) is parsed through
``modelling/multibody/mjcf.py`` and cross-checked against MuJoCo itself:
forward kinematics of every body, the joint-space mass matrix (including
the 0.1 armature on every joint) and inverse dynamics.  MuJoCo loads a
meshless copy (the mesh *assets* are not vendored; every body carries an
explicit ``<inertial>``, so stripping geoms changes nothing dynamical) with
constraints disabled (``mj_inverse`` otherwise folds limit/friction forces
into ``qfrc_inverse``) and the per-dof joint damping added back
(``qfrc_passive`` convention).
"""

import os
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.robots import (
    PANDA_MJCF_PATH,
    make_panda_real,
)

mujoco = pytest.importorskip("mujoco")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PANDA_MJCF_PATH),
    reason="vendored Panda MJCF not available",
)


def _meshless_mj_model():
    tree = ET.parse(PANDA_MJCF_PATH)
    root = tree.getroot()
    for tag in ("asset", "equality", "tendon", "actuator", "contact",
                "keyframe"):
        for el in root.findall(tag):
            root.remove(el)

    def strip(el):
        for g in list(el.findall("geom")):
            el.remove(g)
        for child in el.findall("body"):
            strip(child)

    strip(root.find("worldbody"))
    opt = root.find("option")
    if opt is None:
        opt = ET.SubElement(root, "option")
    ET.SubElement(opt, "flag", {"constraint": "disable"})
    return mujoco.MjModel.from_xml_string(ET.tostring(root, encoding="unicode"))


def test_panda_real_structure():
    model, info = make_panda_real()
    assert model.nq == model.nv == 7
    assert model.armature is not None
    assert np.allclose(np.asarray(model.armature), 0.1)
    for nm in ("attachment", "ee", "elbow", "link4", "link7"):
        assert nm in model.frame_names
    assert info["actuated_dofs"] == tuple(range(7))


def test_panda_real_vs_mujoco():
    model, info = make_panda_real()
    mj = _meshless_mj_model()
    assert mj.nq == model.nq and mj.nv == model.nv
    d = mujoco.MjData(mj)
    rng = np.random.default_rng(0)
    damping = np.asarray(info["damping"])

    for trial in range(3):
        q = rng.uniform(-1.5, 1.5, mj.nq)
        v = rng.normal(size=mj.nv)
        a = rng.normal(size=mj.nv)
        d.qpos[:] = q
        d.qvel[:] = v
        mujoco.mj_forward(mj, d)

        qj = jnp.asarray(q)
        kin = rbd.kinematics(model, qj)
        for bi in range(1, mj.nbody):
            nm = mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, bi)
            if nm in model.frame_names:
                Rf, pf = rbd.frame_placement(
                    model, qj, model.frame_id(nm), kin=kin
                )
                assert np.abs(np.asarray(pf) - d.xpos[bi]).max() < 1e-10
                assert (
                    np.abs(np.asarray(Rf) - d.xmat[bi].reshape(3, 3)).max()
                    < 1e-10
                )

        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        M_us = np.asarray(rbd.mass_matrix(model, qj))
        # residual ~2e-8 is MuJoCo's own principal-axis decomposition of
        # the XML's fullinertia entries, not a parsing error
        assert np.abs(M_mj - M_us).max() < 1e-7

        # set the target acceleration only now: mj_forward overwrites qacc
        d.qacc[:] = a
        mujoco.mj_inverse(mj, d)
        tau_us = (
            np.asarray(rbd.rnea(model, qj, jnp.asarray(v), jnp.asarray(a)))
            + damping * v
        )
        assert np.abs(d.qfrc_inverse - tau_us).max() < 1e-6


def test_panda_reach_runs_on_real_model():
    """The flagship reach example builds on the real model by default."""
    from examples.panda_reach import create_panda_problem

    problem, model, _ = create_panda_problem(nsteps=5, real_model=True)
    assert model.nv == 7
    # real parsed model carries armature (the nominal fallback does not)
    assert model.armature is not None
