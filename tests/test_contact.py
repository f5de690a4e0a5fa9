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
    assert jnp.allclose(forces[0], jnp.array([0.0, 0.0, 2.0 * 9.81]), atol=1e-5)


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
