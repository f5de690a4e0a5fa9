"""MuJoCo cross-validation of the hand-built robot models (round-4,
VERDICT weak #4).

Every hand-built robot is exported to a dynamically-equivalent MJCF
(``mjcf_export.model_to_mjcf``) and its forward kinematics, joint-space
mass matrix and inverse dynamics are checked against MuJoCo — upgrading
the internal-consistency-only validation (RNEA∘FD round trips, energy
conservation) to an external-oracle check, the same trust level as the
ingestion tests.

Convention bridges for floating bases: our free-flyer tangent is the
body twist (v_lin in body frame); MuJoCo's freejoint qvel carries the
linear velocity in the world frame and the angular velocity in the body
frame, and its qpos quaternion is wxyz.  The map T = blockdiag(R, I, I)
relates them (v_mj = T v_ours), so M_ours = Tᵀ M_mj T and, at zero
velocity (no Ṫ term), τ_ours = Tᵀ τ_mj.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.humanoid import make_humanoid
from aligator_tpu.modelling.multibody.mjcf_export import model_to_mjcf
from aligator_tpu.modelling.multibody.quadruped import make_quadruped
from aligator_tpu.modelling.multibody.robots import (
    make_double_pendulum,
    make_free_sphere,
    make_panda,
    make_ur5,
)
from aligator_tpu.modelling.spaces.se3 import quat_to_matrix

mujoco = pytest.importorskip("mujoco")

ROBOTS = {
    "ur5": make_ur5,
    "panda_nominal": make_panda,
    "double_pendulum": make_double_pendulum,
    "humanoid": make_humanoid,
    "quadruped": make_quadruped,
    "free_sphere": make_free_sphere,
}


def _mj_state(model, q):
    """Map our q to MuJoCo qpos (freejoint quaternion xyzw → wxyz)."""
    qpos = np.asarray(q, float).copy()
    i_ours = 0
    out = []
    for t in model.joint_types:
        if t == rbd.FREEFLYER:
            p = qpos[i_ours : i_ours + 3]
            xyzw = qpos[i_ours + 3 : i_ours + 7]
            out.extend(p)
            out.extend([xyzw[3], xyzw[0], xyzw[1], xyzw[2]])
            i_ours += 7
        else:
            out.append(qpos[i_ours])
            i_ours += 1
    return np.asarray(out)


def _vel_map(model, q):
    """T with v_mj = T v_ours (identity except free-flyer linear block)."""
    nv = model.nv
    T = np.eye(nv)
    iv = 0
    iq = 0
    for t in model.joint_types:
        if t == rbd.FREEFLYER:
            R = np.asarray(quat_to_matrix(jnp.asarray(q[iq + 3 : iq + 7])))
            T[iv : iv + 3, iv : iv + 3] = R
            iv += 6
            iq += 7
        else:
            iv += 1
            iq += 1
    return T


@pytest.mark.parametrize("name", sorted(ROBOTS))
def test_vs_mujoco(name):
    model = ROBOTS[name]()
    mj = mujoco.MjModel.from_xml_string(model_to_mjcf(model, name))
    d = mujoco.MjData(mj)
    assert mj.nq == model.nq and mj.nv == model.nv

    cspace = model.configuration_space()
    has_ff = rbd.FREEFLYER in model.joint_types
    rng = np.random.default_rng(0)
    for trial in range(3):
        q = np.asarray(cspace.rand(jax.random.PRNGKey(trial)))
        d.qpos[:] = _mj_state(model, q)
        d.qvel[:] = 0.0
        mujoco.mj_forward(mj, d)
        qj = jnp.asarray(q)
        kin = rbd.kinematics(model, qj)

        # FK: site (frame) world positions
        for fid, fname in enumerate(model.frame_names):
            sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE, fname)
            Rf, pf = rbd.frame_placement(model, qj, fid, kin=kin)
            assert np.abs(np.asarray(pf) - d.site_xpos[sid]).max() < 1e-9
            assert (
                np.abs(
                    np.asarray(Rf) - d.site_xmat[sid].reshape(3, 3)
                ).max()
                < 1e-9
            )

        # mass matrix under the velocity-parameterization bridge
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        T = _vel_map(model, q)
        M_ours = np.asarray(rbd.mass_matrix(model, qj))
        scale = max(1.0, np.abs(M_mj).max())
        assert np.abs(T.T @ M_mj @ T - M_ours).max() < 1e-8 * scale

        # inverse dynamics at zero velocity (gravity + inertial; the
        # Ṫ term vanishes): τ_ours = Tᵀ τ_mj with a_mj = T a_ours
        a = rng.normal(size=model.nv)
        d.qacc[:] = T @ a
        mujoco.mj_inverse(mj, d)
        tau_ours = np.asarray(
            rbd.rnea(model, qj, jnp.zeros(model.nv), jnp.asarray(a))
        )
        tau_scale = max(1.0, np.abs(tau_ours).max())
        assert (
            np.abs(T.T @ d.qfrc_inverse - tau_ours).max() < 1e-8 * tau_scale
        )

        if not has_ff:
            # full Coriolis check for fixed-base models (identity T)
            v = rng.normal(size=model.nv)
            d.qvel[:] = v
            mujoco.mj_forward(mj, d)
            d.qacc[:] = a
            mujoco.mj_inverse(mj, d)
            tau_ours = np.asarray(
                rbd.rnea(model, qj, jnp.asarray(v), jnp.asarray(a))
            )
            assert (
                np.abs(d.qfrc_inverse - tau_ours).max()
                < 1e-8 * max(1.0, np.abs(tau_ours).max())
            )
