"""Extra multibody residuals: collision geometry, fly-high, DCM, whole-body
centroidal momentum (validated against total momentum identities)."""

import jax
import pytest
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


def test_segment_segment_sqdist():
    """Clamped closest-point distance vs brute-force grid minimum."""
    import numpy as np

    from aligator_tpu.modelling.multibody.extra_residuals import (
        _segment_segment_sqdist,
    )

    rng = np.random.default_rng(0)
    for _ in range(20):
        p1, q1, p2, q2 = [jnp.asarray(rng.normal(size=3)) for _ in range(4)]
        d2 = float(_segment_segment_sqdist(p1, q1, p2, q2))
        ss = np.linspace(0.0, 1.0, 201)
        A = np.asarray(p1)[None] + ss[:, None] * np.asarray(q1 - p1)[None]
        B = np.asarray(p2)[None] + ss[:, None] * np.asarray(q2 - p2)[None]
        brute = np.min(
            np.sum((A[:, None, :] - B[None, :, :]) ** 2, axis=-1)
        )
        assert abs(d2 - brute) < 1e-3 + 1e-2 * brute, (d2, brute)


@pytest.mark.slow
def test_link_collision_residual_self_collision():
    """Capsule-capsule self-collision residual on the dual-arm FFSR: the
    nominal posture is collision-free (r < 0); forcing the arms together
    flips the sign; Jacobians check out against finite differences."""
    import numpy as np

    from aligator_tpu.modelling.autodiff import fd_stage_function_jacobians
    from aligator_tpu.modelling.multibody.extra_residuals import (
        LinkCollisionResidual,
    )
    from aligator_tpu.modelling.multibody.robots import (
        FFSR_Q_ARM1,
        FFSR_Q_ARM2,
        make_dual_arm_ffsr,
    )

    model = make_dual_arm_ffsr()
    space = model.phase_space()
    z = jnp.array([0.0, 0.0, 1.0])
    res = LinkCollisionResidual(
        model=model,
        axis1=z, half_len1=jnp.asarray(0.12), radius1=jnp.asarray(0.06),
        axis2=z, half_len2=jnp.asarray(0.12), radius2=jnp.asarray(0.06),
        offset1=jnp.zeros(3), offset2=jnp.zeros(3),
        margin=jnp.asarray(0.02),
        frame_id1=model.frame_id("arm1_tool"),
        frame_id2=model.frame_id("arm2_tool"),
    )

    q = model.neutral()
    q = q.at[7:14].set(jnp.asarray(FFSR_Q_ARM1)).at[14:21].set(
        jnp.asarray(FFSR_Q_ARM2)
    )
    x = jnp.concatenate([q, jnp.zeros(model.nv)])
    u = jnp.zeros((14,))
    r_free = float(res.value(space, x, u)[0])
    assert r_free < 0.0  # nominal posture is collision-free

    # same tool frame against itself => zero distance => deep collision
    res_same = LinkCollisionResidual(
        model=model,
        axis1=z, half_len1=jnp.asarray(0.12), radius1=jnp.asarray(0.06),
        axis2=z, half_len2=jnp.asarray(0.12), radius2=jnp.asarray(0.06),
        offset1=jnp.zeros(3), offset2=jnp.zeros(3),
        margin=jnp.asarray(0.02),
        frame_id1=model.frame_id("arm1_tool"),
        frame_id2=model.frame_id("arm1_tool"),
    )
    assert float(res_same.value(space, x, u)[0]) > 0.0

    Jx, Ju = res.jacobians(space, x, u)
    Jx_fd, Ju_fd = fd_stage_function_jacobians(res, space, x, u)
    assert jnp.max(jnp.abs(Jx - Jx_fd)) < 1e-5
    assert jnp.max(jnp.abs(Ju - Ju_fd)) < 1e-5
