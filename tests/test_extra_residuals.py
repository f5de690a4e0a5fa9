"""Extra multibody residuals: collision geometry, fly-high, DCM, whole-body
centroidal momentum (validated against total momentum identities)."""

import jax
import jax.numpy as jnp

from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.extra_residuals import (
    CentroidalMomentumResidual,
    DCMPositionResidual,
    FlyHighResidual,
    FrameCollisionResidual,
    centroidal_momentum,
)
from aligator_tpu.modelling.multibody.robots import (
    make_double_pendulum,
    make_free_sphere,
    make_ur5,
)


def test_collision_residual_sign():
    model = make_ur5()
    space = model.phase_space()
    x = jnp.concatenate([jnp.zeros(model.nq), jnp.zeros(model.nv)])
    fid = model.frame_id("ee")
    _, p = rbd.frame_placement(model, x[: model.nq], fid)
    # obstacle centered far away → collision-free → r < 0
    far = FrameCollisionResidual(
        model=model, seg_a=p + 5.0, seg_b=p + 6.0, radius=jnp.asarray(0.1),
        frame_id=fid,
    )
    assert float(far.value(space, x, jnp.zeros(6))[0]) < 0.0
    # obstacle at the ee → colliding → r > 0
    near = FrameCollisionResidual(
        model=model, seg_a=p, seg_b=p, radius=jnp.asarray(0.1), frame_id=fid
    )
    assert float(near.value(space, x, jnp.zeros(6))[0]) > 0.0


def test_fly_high_decays_with_height():
    model = make_ur5()
    space = model.phase_space()
    q = jnp.zeros(model.nq)
    v = 0.5 * jnp.ones(model.nv)
    x = jnp.concatenate([q, v])
    res = FlyHighResidual(
        model=model, slope=jnp.asarray(0.1), frame_id=model.frame_id("ee")
    )
    r = res.value(space, x, jnp.zeros(6))
    assert r.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(r)))


def test_centroidal_momentum_free_body():
    """For a single free-floating body the centroidal momentum equals
    (m·v_com, I·ω) exactly."""
    model = make_free_sphere(mass=2.0, radius=0.3)
    q = model.configuration_space().neutral()
    v = jnp.array([1.0, -0.5, 0.25, 0.1, 0.2, -0.3])
    h = centroidal_momentum(model, q, v)
    I = (2.0 / 5.0) * 2.0 * 0.3**2
    assert jnp.allclose(h[:3], 2.0 * v[:3], atol=1e-10)
    assert jnp.allclose(h[3:], I * v[3:], atol=1e-10)


def test_centroidal_momentum_matches_mass_times_com_velocity():
    """Linear part of h must equal total mass × CoM velocity for any robot."""
    model = make_double_pendulum()
    q = jnp.array([0.7, -0.3])
    v = jnp.array([0.4, 1.2])
    h = centroidal_momentum(model, q, v)

    def com_of(qq):
        return rbd.center_of_mass(model, qq)

    vcom = jax.jvp(com_of, (q,), (v,))[1]
    mtot = float(jnp.sum(model.mass))
    assert jnp.allclose(h[:3], mtot * vcom, atol=1e-8)


def test_dcm_residual():
    model = make_double_pendulum()
    space = model.phase_space()
    x = jnp.array([0.3, -0.2, 0.1, 0.4])
    res = DCMPositionResidual(
        model=model, omega_inv=jnp.asarray(0.3), ref=jnp.zeros(3)
    )
    r = res.value(space, x, jnp.zeros(2))
    # at zero velocity the DCM equals the CoM
    x0 = jnp.array([0.3, -0.2, 0.0, 0.0])
    r0 = res.value(space, x0, jnp.zeros(2))
    com = rbd.center_of_mass(model, x0[:2])
    assert jnp.allclose(r0, com, atol=1e-10)
    assert bool(jnp.all(jnp.isfinite(r)))
