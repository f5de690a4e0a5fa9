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


@pytest.mark.slow
def test_kernel_dispatch_inside_vmapped_solver():
    """The consts-free dispatch must survive its production position —
    inside a vmapped ``lax.while_loop`` solver (a custom_vmap with array
    consts trips JAX's consts_batched assertion there; measured during
    round 5). Runs the forced-kernel path (interpret mode) and the std
    path in subprocesses on a tiny contact problem and compares."""
    import os
    import pathlib
    import subprocess
    import sys

    code = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from aligator_tpu import core, solvers
from aligator_tpu._pytree import replace
from aligator_tpu.modelling import IntegratorSemiImplEuler
from aligator_tpu.modelling.multibody.contact import (
    MultibodyConstraintFwdDynamics,
)
from aligator_tpu.modelling.multibody.robots import make_ur5

model = make_ur5()
space = model.phase_space()
nv, nu = model.nv, model.nv
ee = model.frame_id("ee")
ode = MultibodyConstraintFwdDynamics(
    model=model, actuation=jnp.eye(nv, dtype=jnp.float32),
    active=jnp.ones((1,), jnp.float32), contact_frames=(ee,),
    contact_dims=(3,), prox_mu=1e-8, kd=1e-2,
)
dyn = IntegratorSemiImplEuler(ode=ode, timestep=jnp.asarray(0.02, jnp.float32))
x0 = jnp.zeros((model.nq + nv,), jnp.float32).at[1].set(-0.8)
cost = core.CostStack.create(
    core.QuadraticStateCost(x0, 0.1 * jnp.eye(2 * nv, dtype=jnp.float32)),
    core.QuadraticControlCost(1e-3 * jnp.eye(nu, dtype=jnp.float32)),
)
stage = core.make_stage(cost, dyn, space, nu)
problem = core.make_problem(
    x0, stage, 4, core.QuadraticStateCost(x0, jnp.eye(2 * nv, dtype=jnp.float32))
)
cfg = solvers.ProxDDPConfig(
    tol=1e-3, mu_init=1e-2, max_iters=2, max_al_iters=2,
    rollout="linear", ls_max_steps=2,
)
d = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (2, nv), jnp.float32)
def one(dvi):
    res = solvers.solve(
        replace(problem, x0=x0.at[model.nq:].add(dvi)), cfg
    )
    return res.us
us = jax.vmap(one)(d)
import numpy as np
np.save(sys.argv[1], np.asarray(us))
print("SOLVE_DONE")
"""
    root = pathlib.Path(__file__).resolve().parents[1]
    outs = {}
    for tag, extra_env in (("std", {}), ("force", {"ALIGATOR_PT_FORCE": "1"})):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **extra_env)
        out = f"/tmp/_pt_us_{tag}.npy"
        r = subprocess.run(
            [sys.executable, "-c", code, out],
            capture_output=True, text=True, timeout=1200, cwd=root, env=env,
        )
        assert r.returncode == 0, f"{tag}: {r.stdout}\n{r.stderr}"
        outs[tag] = out
    a = np.load(outs["std"])
    b = np.load(outs["force"])
    assert np.isfinite(b).all()
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1.0)
    assert rel < 2e-5, rel
