"""Fused derivative-rows lanes kernel (round-5 VERDICT item 1).

Interpret-mode equality against the jnp reference implementation
(`_fd_rows_std`) — which is itself validated against fp64 autodiff in
``tests/test_rbd_derivatives.py`` — on the two contact configurations the
legged workloads use: humanoid 2×6D soles and quadruped 4×3D feet.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.modelling.multibody import contact as C
from aligator_tpu.modelling.multibody import derivatives as D
from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody import pallas_tensors
from aligator_tpu.modelling.multibody.humanoid import half_sitting, make_humanoid
from aligator_tpu.modelling.multibody.quadruped import make_quadruped


def _run_case(model, q0, contact_frames, contact_dims, kd, K=6):
    dtype = jnp.float64
    nv = model.nv
    key = jax.random.PRNGKey(0)
    dq = 0.05 * jax.random.normal(key, (K, nv), dtype)
    vs = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (K, nv), dtype)
    taus = 2.0 * jax.random.normal(jax.random.PRNGKey(2), (K, nv), dtype)
    cspace = model.configuration_space()
    qs = jax.vmap(lambda d: cspace.integrate(q0.astype(dtype), d))(dq)
    active = jnp.ones((K, len(contact_frames)), dtype)
    prefs = jnp.zeros((K, len(contact_frames), 3), dtype)

    def primal(q, v, tau):
        out = C._cfd_internals(
            model, q, v, tau, contact_frames, jnp.ones(len(contact_frames)),
            prox_mu=1e-10, kd=kd, contact_dims=contact_dims,
        )
        return out["a"], out["lam"]

    a_s, lam_s = jax.vmap(primal)(qs, vs, taus)

    # reference rows
    ref = jax.vmap(
        lambda q, v, a, lam, act, pr: D._fd_rows_std(
            model, q, v, a, lam, act, pr,
            tuple(contact_frames), tuple(contact_dims), 0.0, kd, False,
        )
    )(qs, vs, a_s, lam_s, active, prefs)

    # kernel rows (interpret mode, same fp64 inputs)
    prep = jax.vmap(
        lambda q, v, a: D._prep_lane_inputs(model, q, v, a, contact_frames)
    )(qs, vs, a_s)
    S, Vb, Vpar, Vdof, Ca, Capar, Accb, h, y, I6, pcs = prep
    top = rbd._topology(model.joint_types, model.parents)
    A_np = np.asarray(top["A"], np.float64)
    D_np = np.asarray(A_np[top["dof_joint"], :], np.float64)
    ker = pallas_tensors.fd_rows_lanes(
        S, vs, Vb, Vpar, Vdof, Ca, Capar, Accb, h, y, I6,
        lam_s, pcs, active, prefs,
        jnp.asarray(A_np), jnp.asarray(D_np), jnp.asarray(D_np.T),
        contact_bodies=tuple(
            model.frame_parents[f] for f in contact_frames
        ),
        contact_dims=tuple(contact_dims), kd=kd, kp=0.0, has_prefs=False,
        interpret=True,
    )
    names = ("ra1_q", "ra1_v", "r2_q", "r2_v")
    for name, r, k in zip(names, ref, ker):
        scale = float(jnp.abs(r).max()) + 1.0
        err = float(jnp.abs(r - k).max()) / scale
        assert err < 1e-10, f"{name}: rel err {err}"


@pytest.mark.slow
def test_humanoid_2x6d_rows_match():
    model = make_humanoid()
    _run_case(
        model, half_sitting(model),
        (model.frame_id("left_sole"), model.frame_id("right_sole")),
        (6, 6), kd=50.0,
    )


@pytest.mark.slow
def test_quadruped_4x3d_rows_match():
    from aligator_tpu.modelling.multibody.quadruped import (
        standing_configuration,
    )

    model = make_quadruped()
    feet = tuple(model.frame_id(f"foot{k}") for k in range(4))
    q0 = standing_configuration(model)
    _run_case(model, q0, feet, (3, 3, 3, 3), kd=10.0)
