"""Rigid-body algorithm validation.

No Pinocchio oracle is available in this environment, so validation uses
internal-consistency identities (the standard RBD test battery):
  * double pendulum vs closed-form Lagrangian dynamics
  * forward-dynamics ∘ RNEA round trip
  * mass-matrix symmetry / positive-definiteness / Christoffel consistency
  * energy conservation under symplectic simulation
  * free-flyer momentum conservation, ballistic CoM
  * frame Jacobians vs finite differences
"""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.robots import (
    make_double_pendulum,
    make_free_sphere,
    make_pendulum,
    make_ur5,
)


def closed_form_double_pendulum(q, v, tau, l1=1.0, l2=1.0, m1=1.0, m2=1.0, g=9.81):
    """Standard textbook double-pendulum dynamics (point masses, angles from
    straight-down, both about +y so positive q swings +x)."""
    t1, t2 = q
    dt1, dt2 = v
    M11 = (m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * jnp.cos(t2)
    M12 = m2 * l2**2 + m2 * l1 * l2 * jnp.cos(t2)
    M22 = m2 * l2**2
    M = jnp.array([[M11, M12], [M12, M22]])
    h = -m2 * l1 * l2 * jnp.sin(t2)
    C = jnp.array(
        [h * dt2 * (2 * dt1 + dt2), -h * dt1 * dt1]
    )
    G = jnp.array(
        [
            (m1 + m2) * g * l1 * jnp.sin(t1) + m2 * g * l2 * jnp.sin(t1 + t2),
            m2 * g * l2 * jnp.sin(t1 + t2),
        ]
    )
    return jnp.linalg.solve(M, tau - C - G)


def test_double_pendulum_vs_closed_form():
    model = make_double_pendulum()
    q = jnp.array([0.3, -0.7])
    v = jnp.array([0.5, 1.1])
    tau = jnp.array([0.2, -0.1])
    a = rbd.aba(model, q, v, tau)
    a_ref = closed_form_double_pendulum(q, v, tau)
    assert jnp.allclose(a, a_ref, atol=1e-6), (a, a_ref)


def test_rnea_aba_roundtrip():
    for model in (make_double_pendulum(), make_ur5()):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        nv = model.nv
        q = jax.random.normal(k1, (model.nq,))
        v = jax.random.normal(k2, (nv,))
        a = jax.random.normal(k3, (nv,))
        tau = rbd.rnea(model, q, v, a)
        a_back = rbd.aba(model, q, v, tau)
        assert jnp.allclose(a, a_back, atol=1e-8)


def test_mass_matrix_properties():
    model = make_ur5()
    q = jax.random.normal(jax.random.PRNGKey(1), (model.nq,))
    M = rbd.mass_matrix(model, q)
    assert jnp.allclose(M, M.T, atol=1e-10)
    eigs = jnp.linalg.eigvalsh(M)
    assert float(eigs.min()) > 0.0
    # RNEA linearity in acceleration: rnea(q,0,a) = M a + g-term
    v0 = jnp.zeros(model.nv)
    a = jax.random.normal(jax.random.PRNGKey(2), (model.nv,))
    lhs = rbd.rnea(model, q, v0, a) - rbd.rnea(model, q, v0, v0)
    assert jnp.allclose(lhs, M @ a, atol=1e-8)


def test_energy_conservation_pendulum():
    """Simulate the double pendulum with RK4; total energy must be conserved
    to integrator accuracy."""
    model = make_double_pendulum()

    def energy(q, v):
        M = rbd.mass_matrix(model, q)
        kin = 0.5 * v @ (M @ v)
        # potential from CoM height
        fk = rbd.forward_kinematics(model, q)
        pot = 0.0
        for i in range(model.njoints):
            c_w = fk["p"][i] + fk["R"][i] @ model.com[i]
            pot += model.mass[i] * 9.81 * c_w[2]
        return kin + pot

    def xdot(state):
        q, v = state[:2], state[2:]
        a = rbd.aba(model, q, v, jnp.zeros(2))
        return jnp.concatenate([v, a])

    h = 1e-3
    state = jnp.array([1.2, 0.4, 0.0, 0.0])
    E0 = energy(state[:2], state[2:])

    def step(state, _):
        k1 = xdot(state)
        k2 = xdot(state + 0.5 * h * k1)
        k3 = xdot(state + 0.5 * h * k2)
        k4 = xdot(state + h * k3)
        return state + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

    state, _ = jax.lax.scan(step, state, None, length=2000)
    E1 = energy(state[:2], state[2:])
    assert abs(float(E1 - E0)) < 1e-6


def test_free_flyer_ballistic():
    """Free body under gravity: CoM follows a parabola; angular velocity is
    constant (sphere), linear momentum evolves as m·g·t."""
    model = make_free_sphere()
    space = model.configuration_space()
    q = space.neutral()
    v = jnp.array([1.0, 0.5, 2.0, 0.3, -0.2, 0.1])  # (v_lin body, ω body)
    a = rbd.aba(model, q, v, jnp.zeros(6))
    # at identity orientation: linear acceleration (body) must equal
    # gravity minus ω×v (body-frame derivative), angular acc = 0 for a sphere
    w, vl = v[3:], v[:3]
    expected_lin = jnp.array([0.0, 0.0, -9.81]) - jnp.cross(w, vl)
    assert jnp.allclose(a[:3], expected_lin, atol=1e-8), a
    assert jnp.allclose(a[3:], 0.0, atol=1e-8)


def test_frame_jacobian_vs_fd():
    model = make_ur5()
    q = jax.random.normal(jax.random.PRNGKey(5), (model.nq,))
    fid = model.frame_id("ee")

    def pos(qq):
        _, p = rbd.frame_placement(model, qq, fid)
        return p

    J = jax.jacfwd(pos)(q)
    eps = 1e-6
    for j in range(model.nq):
        dq = jnp.zeros(model.nq).at[j].set(eps)
        fd = (pos(q + dq) - pos(q - dq)) / (2 * eps)
        assert jnp.allclose(J[:, j], fd, atol=1e-5)


def test_frame_velocity_consistent_with_fd():
    """Local-frame linear velocity == R^T d(p)/dt."""
    model = make_ur5()
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (model.nq,))
    v = jax.random.normal(jax.random.PRNGKey(8), (model.nq,))
    fid = model.frame_id("ee")

    vel = rbd.frame_velocity(model, q, v, fid)
    R, p = rbd.frame_placement(model, q, fid)

    def pos(qq):
        return rbd.frame_placement(model, qq, fid)[1]

    dp = jax.jvp(pos, (q,), (v,))[1]
    assert jnp.allclose(vel[:3], R.T @ dp, atol=1e-8)


def test_com_weighted_average():
    model = make_double_pendulum()
    q = jnp.array([0.0, 0.0])
    com = rbd.center_of_mass(model, q)
    # both point masses hang straight down: com z = -(1*1 + 1*2)/2 = -1.5
    assert jnp.allclose(com, jnp.array([0.0, 0.0, -1.5]), atol=1e-10)


def test_vmap_batched_dynamics():
    model = make_ur5()
    qs = jax.random.normal(jax.random.PRNGKey(9), (8, model.nq))
    vs = jax.random.normal(jax.random.PRNGKey(10), (8, model.nv))
    taus = jax.random.normal(jax.random.PRNGKey(11), (8, model.nv))
    accs = jax.vmap(lambda q, v, t: rbd.aba(model, q, v, t))(qs, vs, taus)
    assert accs.shape == (8, 6)
    assert bool(jnp.all(jnp.isfinite(accs)))


def test_panda_model():
    """Panda: documented home ('ready') flange pose + RBD identities."""
    from aligator_tpu.modelling.multibody.robots import PANDA_Q_HOME, make_panda

    model = make_panda()
    assert model.nq == model.nv == 7
    # flange position at the ready pose (public franka kinematics:
    # x = 0.088 + 0.0825·… → 0.307, z = 0.59 without the hand)
    _, p = rbd.frame_placement(model, PANDA_Q_HOME, model.frame_id("ee"))
    assert jnp.allclose(p, jnp.array([0.3069, 0.0, 0.5903]), atol=1e-3), p

    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    q = 0.5 * jax.random.normal(k1, (7,))
    v = jax.random.normal(k2, (7,))
    a = jax.random.normal(k3, (7,))
    tau = rbd.rnea(model, q, v, a)
    assert jnp.allclose(rbd.aba(model, q, v, tau), a, atol=1e-8)
    M = rbd.mass_matrix(model, q)
    assert float(jnp.linalg.eigvalsh(M).min()) > 0.0
