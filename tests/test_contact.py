"""Contact-constrained dynamics validation: constrained points don't
accelerate; contact forces balance gravity in static poses."""

import jax
import jax.numpy as jnp

from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.contact import (
    constrained_fwd_dynamics,
    contact_jacobian,
    contact_drift,
)
from aligator_tpu.modelling.multibody.robots import (
    make_double_pendulum,
    make_free_sphere,
)


def test_static_contact_force_balances_gravity():
    model = make_free_sphere(mass=2.0)
    q = model.configuration_space().neutral()
    v = jnp.zeros(6)
    tau = jnp.zeros(6)
    a, forces = constrained_fwd_dynamics(
        model, q, v, tau, (0,), jnp.array([1.0])
    )
    # the center is pinned: no acceleration; contact force = m·g upward
    assert jnp.allclose(a[:3], 0.0, atol=1e-6)
    assert jnp.allclose(forces[:3], jnp.array([0.0, 0.0, 2.0 * 9.81]), atol=1e-5)


def test_inactive_contact_is_free_fall():
    model = make_free_sphere(mass=2.0)
    q = model.configuration_space().neutral()
    v = jnp.zeros(6)
    a, forces = constrained_fwd_dynamics(
        model, q, v, jnp.zeros(6), (0,), jnp.array([0.0])
    )
    assert jnp.allclose(a[:3], jnp.array([0.0, 0.0, -9.81]), atol=1e-8)
    assert jnp.allclose(forces, 0.0, atol=1e-8)


def test_pinned_tip_zero_acceleration():
    """Double pendulum with the tip pinned: the tip's world acceleration
    (J a + γ) must vanish."""
    model = make_double_pendulum()
    fid = model.frame_id("tip")
    q = jnp.array([0.4, -0.3])
    v = jnp.array([0.6, 0.2])
    tau = jnp.array([0.5, -0.1])
    a, forces = constrained_fwd_dynamics(
        model, q, v, tau, (fid,), jnp.array([1.0]), prox_mu=1e-10
    )
    J = contact_jacobian(model, q, fid)
    g = contact_drift(model, q, v, fid)
    point_acc = J @ a + g
    assert jnp.allclose(point_acc, 0.0, atol=1e-6), point_acc


def test_contact_dynamics_jit_vmap():
    model = make_double_pendulum()
    fid = model.frame_id("tip")

    @jax.jit
    def fd(q, v, tau, act):
        return constrained_fwd_dynamics(model, q, v, tau, (fid,), act)[0]

    qs = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    vs = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    taus = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    acts = jnp.array([[1.0], [0.0], [1.0], [0.0]])
    accs = jax.vmap(fd)(qs, vs, taus, acts)
    assert accs.shape == (4, 2)
    assert bool(jnp.all(jnp.isfinite(accs)))


def test_6d_contact_pins_frame():
    """Humanoid with both soles in 6D contact, half-sitting: zero joint
    acceleration of the pinned feet (spatial acceleration J6·a + γ = 0)."""
    from aligator_tpu.modelling.multibody import model as rbd_mod
    from aligator_tpu.modelling.multibody.contact import frame_velocity_lwa, _drift
    from aligator_tpu.modelling.multibody.humanoid import (
        actuation_matrix,
        half_sitting,
        make_humanoid,
    )

    model = make_humanoid()
    q = half_sitting(model)
    v = jax.random.normal(jax.random.PRNGKey(3), (model.nv,)) * 0.1
    tau = jnp.zeros(model.nv)
    fids = (model.frame_id("left_sole"), model.frame_id("right_sole"))
    a, forces = constrained_fwd_dynamics(
        model, q, v, tau, fids, jnp.array([1.0, 1.0]),
        prox_mu=1e-10, contact_dims=(6, 6),
    )
    assert forces.shape == (12,)
    for k, fid in enumerate(fids):
        J6 = rbd_mod.frame_jacobian_lwa(model, q, fid)
        g = _drift(model, q, v, fid, 6)
        acc6 = J6 @ a + g
        assert jnp.allclose(acc6, 0.0, atol=1e-5), acc6


def test_underactuated_constrained_rnea():
    """Static inverse dynamics (reference constrained-rnea.hpp:22): the
    (u, f) returned must balance the bias forces exactly — zero residual in
    the underactuated rows too — and support the robot's weight."""
    from aligator_tpu.modelling.multibody import model as rbd_mod
    from aligator_tpu.modelling.multibody.contact import (
        underactuated_constrained_rnea,
    )
    from aligator_tpu.modelling.multibody.humanoid import (
        actuation_matrix,
        half_sitting,
        make_humanoid,
    )

    model = make_humanoid()
    q = half_sitting(model)
    v = jnp.zeros(model.nv)
    B = actuation_matrix(model)
    fids = (model.frame_id("left_sole"), model.frame_id("right_sole"))
    u, forces = underactuated_constrained_rnea(
        model, q, v, B, fids, contact_dims=(6, 6)
    )
    assert u.shape == (B.shape[1],)
    assert forces.shape == (12,)

    nle = rbd_mod.rnea(model, q, v, jnp.zeros(model.nv))
    Jl = rbd_mod.frame_jacobian_lwa(model, q, fids[0])
    Jr = rbd_mod.frame_jacobian_lwa(model, q, fids[1])
    Jc = jnp.concatenate([Jl, Jr], axis=0)
    residual = B @ u + Jc.T @ forces - nle
    assert jnp.allclose(residual, 0.0, atol=1e-8), residual

    # feet carry the weight UPWARD: total vertical force = +m*g (the force
    # the ground applies ON the robot — same sign convention as
    # constrained_fwd_dynamics)
    total_fz = float(forces[2] + forces[8])
    weight = float(jnp.sum(model.mass) * 9.81)
    assert abs(total_fz - weight) < 1e-6 * weight, (total_fz, weight)


def test_6d_contact_newton_euler_balance():
    """Newton–Euler identity: total contact force + gravity must equal the
    time derivative of the robot's total linear momentum under the
    contact-constrained accelerations."""
    from aligator_tpu.modelling.multibody import model as rbd_mod
    from aligator_tpu.modelling.multibody.humanoid import half_sitting, make_humanoid

    model = make_humanoid()
    cspace = model.configuration_space()
    q = half_sitting(model)
    v = jnp.zeros(model.nv)
    fids = (model.frame_id("left_sole"), model.frame_id("right_sole"))
    a, forces = constrained_fwd_dynamics(
        model, q, v, jnp.zeros(model.nv), fids, jnp.array([1.0, 1.0]),
        prox_mu=1e-10, contact_dims=(6, 6),
    )

    def linear_momentum(dq, vv):
        qq = cspace.integrate(q, dq)
        kin = rbd_mod.kinematics(model, qq, vv)
        m, c_w, I_w = rbd_mod._world_inertia(model, kin["R"], kin["p"], q.dtype)
        h = rbd_mod.inertia_apply(m, c_w, I_w, kin["V"])
        return jnp.sum(h[:, :3], axis=0)

    z = jnp.zeros(model.nv)
    dP = jax.jvp(linear_momentum, (z, v), (v, a))[1]
    total_mass = jnp.sum(model.mass)
    f_lin = forces[:3] + forces[6:9]
    residual = f_lin + total_mass * model.gravity - dP
    assert jnp.allclose(residual, 0.0, atol=1e-6), residual


def test_redundant_contacts_fp32_finite():
    """Regression: the Delassus operator of 4 coplanar point feet on a
    quadruped is rank-deficient; with prox_mu=1e-8 (below fp32 round-off)
    the Cholesky used to emit NaN. The dtype-aware regularization floor must
    keep the solve finite in fp32 while staying exact in fp64."""
    from aligator_tpu.modelling.multibody.contact import constrained_fwd_dynamics
    from aligator_tpu.modelling.multibody.quadruped import (
        make_quadruped,
        standing_configuration,
    )

    model = make_quadruped()
    q0 = standing_configuration(model)
    for dtype in (jnp.float32, jnp.float64):
        q = q0.astype(dtype)
        v = jnp.zeros((model.nv,), dtype)
        tau = jnp.zeros((model.nv,), dtype)
        a, lam = constrained_fwd_dynamics(
            model, q, v, tau, (0, 1, 2, 3), jnp.ones((4,), dtype),
            prox_mu=1e-8, kd=10.0,
        )
        assert bool(jnp.isfinite(a).all()), dtype
        assert bool(jnp.isfinite(lam).all()), dtype
        # the stance feet push (total normal force supports the robot)
        fz = lam.reshape(4, 3)[:, 2]
        assert float(fz.sum()) > 0.0
