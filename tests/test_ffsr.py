"""Dual-arm free-floating space robot (FFSR) — the reference fork's vendored
application workload (``dual-FFSR_ProxDDP/main3.py``).

Validates the model's free-floating physics (zero-gravity momentum
conservation under arm motion, base reaction to internal torques) and that
ProxDDP solves a short-horizon coordinated dual-tool reach.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from aligator_tpu import solvers
from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.extra_residuals import centroidal_momentum
from aligator_tpu.modelling.multibody.robots import (
    FFSR_Q_ARM1,
    FFSR_Q_ARM2,
    make_dual_arm_ffsr,
)


def _nominal_q(model, dtype=jnp.float64):
    q = model.neutral().astype(dtype)
    q = q.at[7:14].set(jnp.asarray(FFSR_Q_ARM1, dtype))
    q = q.at[14:21].set(jnp.asarray(FFSR_Q_ARM2, dtype))
    return q


def test_ffsr_model_dims():
    model = make_dual_arm_ffsr()
    assert model.nq == 21 and model.nv == 20  # matches the vendored app
    assert model.frame_id("arm1_tool") != model.frame_id("arm2_tool")


def test_ffsr_zero_gravity_momentum_conservation():
    """Internal (arm) torques must conserve the total centroidal momentum of
    the free-floating system. Checked exactly in continuous time: ḣ along
    the ABA flow (q̇ = v, v̇ = ABA(q, v, τ_internal)) is zero by autodiff —
    no integrator drift in the check."""
    model = make_dual_arm_ffsr()
    q = _nominal_q(model)
    key = jax.random.PRNGKey(0)
    v = 0.3 * jax.random.normal(key, (model.nv,), q.dtype)
    tau = jnp.zeros(model.nv, q.dtype)
    tau = tau.at[8].set(3.0).at[11].set(-2.0).at[15].set(1.5)
    a = rbd.aba(model, q, v, tau)
    cs = model.configuration_space()

    def h_of(s):
        return centroidal_momentum(model, cs.integrate(q, s * v), v + s * a)

    h, hdot = jax.jvp(h_of, (0.0,), (1.0,))
    assert np.allclose(np.asarray(hdot), 0.0, atol=1e-10), hdot
    # and the base must actually react to internal torques (coupling)
    assert float(jnp.linalg.norm(a[:6])) > 1e-3


@pytest.mark.slow
def test_ffsr_reach_solve():
    from examples.dual_ffsr_reach import create_ffsr_problem

    problem, model, targets = create_ffsr_problem(
        nsteps=20, timestep=0.05, dtype=jnp.float64
    )
    # monotone Armijo: the nonmonotone default admits a Gauss-Newton limit
    # cycle on this task (cost oscillates at alpha=1 and the dual stalls)
    cfg = solvers.ProxDDPConfig(
        tol=1e-3, mu_init=1e-2, max_iters=60, rollout="nonlinear",
        ls_strategy="armijo",
    )
    res = solvers.solve(problem, cfg)
    assert bool(res.conv), (float(res.prim_infeas), float(res.dual_infeas))
    # torque bounds respected (500 for the parsed MJCF model, 87 nominal)
    from examples.dual_ffsr_reach import load_ffsr_model

    _, _, u_max = load_ffsr_model()
    assert float(jnp.max(jnp.abs(res.us[:, :4]))) <= u_max[0] + 1e-6
    # tools moved toward their targets
    qN = res.xs[-1][: model.nq]
    q0 = res.xs[0][: model.nq]
    for name, (_, p_t) in targets.items():
        fid = model.frame_id(name)
        _, p0 = rbd.frame_placement(model, q0, fid)
        _, pN = rbd.frame_placement(model, qN, fid)
        err0 = float(jnp.linalg.norm(p0 - p_t))
        errN = float(jnp.linalg.norm(pN - p_t))
        assert errN < 0.5 * err0, (name, err0, errN)
