"""Body-body loop constraints (grasps) + the UR10 payload-throw example
(round-5 VERDICT item 5 — the reference ``examples/ur10_ballistic.py``
capability: composite arm+payload model, 6D rigid grasp, model switch at
release, ballistic terminal equality)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.modelling.multibody import contact, model as rbd
from aligator_tpu.modelling.multibody.robots import make_ur10_with_payload

Q0_ARM = jnp.asarray(
    np.array([0.0, np.deg2rad(-120), 2 * np.pi / 3, np.deg2rad(-45), 0.0, 0.0])
)


def _setup():
    m = make_ur10_with_payload()
    ee, mug = m.frame_id("ee"), m.frame_id("mug")
    q_tmp = jnp.concatenate(
        [Q0_ARM, jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0])]
    )
    _, p_ee = rbd.frame_placement(m, q_tmp, ee)
    q0 = q_tmp.at[6:9].set(p_ee)
    B = jnp.concatenate([jnp.eye(6), jnp.zeros((6, 6))], axis=0)
    return m, ee, mug, q0, B


def test_composite_model_dims():
    m, ee, mug, q0, B = _setup()
    assert m.nq == 13 and m.nv == 12  # 6 arm + 7/6 free-flyer payload


def test_grasp_inverse_dynamics_equilibrium():
    """underactuated_constrained_rnea with the 6D loop constraint holds
    the grasped payload: zero acceleration, gravity-compensating grasp
    force (reference underactuatedConstrainedInverseDynamics role)."""
    m, ee, mug, q0, B = _setup()
    v0 = jnp.zeros(m.nv)
    u0, f0 = contact.underactuated_constrained_rnea(
        m, q0, v0, B, (ee,), contact_dims=(6,), contact_frames2=(mug,)
    )
    # grasp wrench z-component supports the payload weight
    assert abs(abs(float(f0[2])) - 0.5 * 9.81) < 1e-6
    a, _ = contact.constrained_fwd_dynamics(
        m, q0, v0, B @ u0, (ee,), jnp.ones(1),
        contact_dims=(6,), contact_frames2=(mug,), prox_mu=1e-10,
    )
    assert float(jnp.abs(a).max()) < 1e-6


def test_loop_constraint_relative_acceleration_zero():
    """Active 6D loop constraint pins the relative acceleration:
    J_rel a + γ = 0 at any torque."""
    m, ee, mug, q0, B = _setup()
    v0 = 0.1 * jnp.sin(jnp.arange(m.nv, dtype=jnp.float64))
    tau = B @ (10.0 * jnp.ones(6))
    a, _ = contact.constrained_fwd_dynamics(
        m, q0, v0, tau, (ee,), jnp.ones(1),
        contact_dims=(6,), contact_frames2=(mug,), prox_mu=1e-10,
    )
    Jr = contact.relative_jacobian_lwa(m, q0, ee, mug, 6)
    gam = contact._rel_drift(m, q0, v0, ee, mug, 6)
    assert float(jnp.abs(Jr @ a + gam).max()) < 1e-7


def test_loop_release_is_free_fall():
    """Inactive loop constraint = free dynamics: the payload block of the
    acceleration is pure gravity."""
    m, ee, mug, q0, B = _setup()
    v0 = jnp.zeros(m.nv)
    a, f = contact.constrained_fwd_dynamics(
        m, q0, v0, B @ jnp.zeros(6), (ee,), jnp.zeros(1),
        contact_dims=(6,), contact_frames2=(mug,), prox_mu=1e-10,
    )
    assert float(jnp.abs(f).max()) < 1e-9  # no grasp force
    # payload linear acceleration = g (free-flyer tangent block 6:9)
    assert float(jnp.abs(a[6:9] - jnp.array([0.0, 0.0, -9.81])).max()) < 1e-8


def test_loop_acc_derivatives_match_fd():
    """acc_derivatives (autodiff loop path) vs fp64 jacfwd oracle."""
    m, ee, mug, q0, B = _setup()
    ode = contact.MultibodyConstraintFwdDynamics(
        model=m, actuation=B, active=jnp.ones(1), contact_frames=(ee,),
        contact_dims=(6,), contact_frames2=(mug,), prox_mu=1e-9, kd=1e-2,
    )
    space = m.phase_space()
    x = jnp.concatenate([q0, 0.05 * jnp.ones(m.nv)])
    u = 2.0 * jnp.ones(6)
    a, dq, dv, du = ode.acc_derivatives(space, x, u)
    cspace = m.configuration_space()

    def acc_of(z):
        qq = cspace.integrate(q0, z[: m.nv])
        vv = x[m.nq:] + z[m.nv : 2 * m.nv]
        uu = u + z[2 * m.nv :]
        out = contact._cfd_internals(
            m, qq, vv, B @ uu, (ee,), jnp.ones(1),
            prox_mu=1e-9, kd=1e-2, contact_dims=(6,),
            contact_frames2=(mug,),
        )
        return out["a"]

    J = jax.jacfwd(acc_of)(jnp.zeros(2 * m.nv + 6))
    assert float(jnp.abs(J[:, : m.nv] - dq).max()) < 1e-9
    assert float(jnp.abs(J[:, m.nv : 2 * m.nv] - dv).max()) < 1e-9
    assert float(jnp.abs(J[:, 2 * m.nv :] - du).max()) < 1e-9


@pytest.mark.slow
def test_ur10_ballistic_example_converges():
    """The full grasp-throw-release OCP converges and the payload hits
    the target under the torque bounds (reference ur10_ballistic.py
    protocol at reduced N).

    The grasp's Baumgarte corrector gains are load-bearing (measured):
    with the reference's Kp=1e-3 / Kd=2√Kp the solve converges cleanly
    (prim 4e-6, 400 iterations); without the position term the AL loop
    is trajectory-chaotic, and with Kp=1 it over-stiffens — see the gain
    note in the example."""
    from examples.ur10_ballistic import (
        TARGET_POS,
        create_ur10_ballistic_problem,
    )
    from aligator_tpu import solvers
    from aligator_tpu.utils.rollout import rollout

    problem, model, u0, sched = create_ur10_ballistic_problem(
        nsteps=80, timestep=0.025
    )
    us_init = jnp.tile(u0[None], (80, 1))
    xs_init = rollout(
        problem.stages.dynamics, problem.space, problem.x0, us_init
    )
    cfg = solvers.ProxDDPConfig(
        tol=1e-4, dual_tol=1e-3, mu_init=1e-2, max_iters=400,
        rollout="linear", ls_strategy="filter",
    )
    res = solvers.solve(problem, cfg, xs_init=xs_init, us_init=us_init)
    assert bool(res.conv), (
        float(res.prim_infeas), float(res.dual_infeas)
    )
    p_final = res.xs[-1][6:9]
    assert float(jnp.abs(p_final - jnp.asarray(TARGET_POS)).max()) < 1e-3
    # torque limits respected
    from aligator_tpu.modelling.multibody.robots import ur10_effort_limits

    assert bool(
        jnp.all(jnp.abs(res.us) <= ur10_effort_limits()[None, :] + 1e-5)
    )
