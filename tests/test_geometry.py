"""Collision-geometry pairs: signed-distance primitives + frame residuals
with FD-checked Jacobians (reference ``frame-collision.hpp:18`` over general
coal geometry pairs; the reference pytest suite FD-checks every residual)."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.modelling.autodiff import fd_stage_function_jacobians
from aligator_tpu.modelling.multibody import geometry as geo
from aligator_tpu.modelling.multibody import model as rbd
from aligator_tpu.modelling.multibody.robots import make_ur5


def test_point_halfspace():
    n = jnp.array([0.0, 0.0, 1.0])
    assert float(geo.point_halfspace_distance(jnp.array([1.0, 2.0, 3.0]), n, 0.5)) == pytest.approx(2.5)
    # segment: minimum over endpoints
    d = geo.segment_halfspace_distance(
        jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 0.0, -2.0]), n, 0.0
    )
    assert float(d) == pytest.approx(-2.0)


def test_point_box_signed_distance():
    c = jnp.zeros(3)
    R = jnp.eye(3)
    h = jnp.array([1.0, 2.0, 3.0])
    # outside along +x
    assert float(geo.point_box_distance(jnp.array([3.0, 0.0, 0.0]), c, R, h)) == pytest.approx(2.0, abs=1e-5)
    # outside along a corner
    p = jnp.array([2.0, 3.0, 4.0])
    assert float(geo.point_box_distance(p, c, R, h)) == pytest.approx(jnp.sqrt(3.0), abs=1e-5)
    # inside: negative distance to the closest face
    assert float(geo.point_box_distance(jnp.array([0.5, 0.0, 0.0]), c, R, h)) == pytest.approx(-0.5, abs=1e-5)
    # rotated box: 90° about z swaps x/y half-extents
    Rz = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    assert float(geo.point_box_distance(jnp.array([3.0, 0.0, 0.0]), c, Rz, h)) == pytest.approx(1.0, abs=1e-5)


def test_sphere_sphere():
    d = geo.sphere_sphere_distance(jnp.zeros(3), 0.5, jnp.array([2.0, 0.0, 0.0]), 0.25)
    assert float(d) == pytest.approx(1.25, abs=1e-6)
    d = geo.sphere_sphere_distance(jnp.zeros(3), 0.5, jnp.array([0.6, 0.0, 0.0]), 0.25)
    assert float(d) == pytest.approx(-0.15, abs=1e-6)


def _ur5_state(seed=0):
    model = make_ur5()
    q = 0.3 * jax.random.normal(jax.random.PRNGKey(seed), (model.nq,))
    x = jnp.concatenate([q, jnp.zeros(model.nv)])
    return model, x


@pytest.mark.parametrize("half_len", [0.0, 0.15])
def test_frame_halfspace_residual(half_len):
    model, x = _ur5_state()
    space = model.phase_space()
    fid = model.frame_id("ee")
    res = geo.FrameHalfspaceResidual(
        model=model,
        normal=jnp.array([0.0, 0.0, 1.0]),
        plane_offset=jnp.asarray(0.0),
        offset=jnp.array([0.0, 0.0, 0.05]),
        radius=jnp.asarray(0.04),
        axis=jnp.array([0.0, 0.0, 1.0]),
        half_len=jnp.asarray(half_len),
        margin=jnp.asarray(0.01),
        frame_id=fid,
    )
    u = jnp.zeros(6)
    r = res.value(space, x, u)
    assert r.shape == (1,)
    # sign convention: dropping the plane far below the robot → clear (r<0)
    low = geo.FrameHalfspaceResidual(
        model=model, normal=jnp.array([0.0, 0.0, 1.0]),
        plane_offset=jnp.asarray(-10.0), offset=res.offset, radius=res.radius,
        axis=res.axis, half_len=res.half_len, margin=res.margin, frame_id=fid,
    )
    assert float(low.value(space, x, u)[0]) < 0.0
    # plane far above → deep violation (r>0)
    high = geo.FrameHalfspaceResidual(
        model=model, normal=jnp.array([0.0, 0.0, 1.0]),
        plane_offset=jnp.asarray(10.0), offset=res.offset, radius=res.radius,
        axis=res.axis, half_len=res.half_len, margin=res.margin, frame_id=fid,
    )
    assert float(high.value(space, x, u)[0]) > 0.0
    Jx, Ju = res.jacobians(space, x, u)
    Jx_fd, Ju_fd = fd_stage_function_jacobians(res, space, x, u)
    assert jnp.allclose(Jx, Jx_fd, atol=1e-5)
    assert jnp.allclose(Ju, Ju_fd, atol=1e-8)


def test_frame_sphere_residual_fd():
    model, x = _ur5_state(1)
    space = model.phase_space()
    fid = model.frame_id("ee")
    _, p = rbd.frame_placement(model, x[: model.nq], fid)
    res = geo.FrameSphereResidual(
        model=model,
        center_obs=p + jnp.array([0.3, 0.1, -0.2]),
        radius_obs=jnp.asarray(0.1),
        offset=jnp.array([0.0, 0.02, 0.0]),
        radius=jnp.asarray(0.05),
        margin=jnp.asarray(0.01),
        frame_id=fid,
    )
    u = jnp.zeros(6)
    assert float(res.value(space, x, u)[0]) < 0.0  # obstacle offset → clear
    Jx, Ju = res.jacobians(space, x, u)
    Jx_fd, _ = fd_stage_function_jacobians(res, space, x, u)
    assert jnp.allclose(Jx, Jx_fd, atol=1e-5)
    assert jnp.allclose(Ju, 0.0)


def test_frame_box_residual_fd():
    model, x = _ur5_state(2)
    space = model.phase_space()
    fid = model.frame_id("ee")
    Rz = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    res = geo.FrameBoxResidual(
        model=model,
        box_center=jnp.array([0.8, 0.0, 0.3]),
        box_rot=Rz,
        half_extents=jnp.array([0.2, 0.3, 0.25]),
        offset=jnp.zeros(3),
        radius=jnp.asarray(0.05),
        margin=jnp.asarray(0.0),
        frame_id=fid,
    )
    u = jnp.zeros(6)
    Jx, _ = res.jacobians(space, x, u)
    Jx_fd, _ = fd_stage_function_jacobians(res, space, x, u)
    assert jnp.allclose(Jx, Jx_fd, atol=1e-5)


def test_frame_sphere_sphere_self_collision_fd():
    model, x = _ur5_state(3)
    space = model.phase_space()
    res = geo.FrameSphereSphereResidual(
        model=model,
        offset1=jnp.array([0.0, 0.0, 0.1]),
        radius1=jnp.asarray(0.06),
        offset2=jnp.array([0.0, 0.0, -0.1]),
        radius2=jnp.asarray(0.06),
        margin=jnp.asarray(0.01),
        frame_id1=model.frame_id("ee"),
        frame_id2=0,
    )
    u = jnp.zeros(6)
    r = res.value(space, x, u)
    assert r.shape == (1,) and bool(jnp.isfinite(r[0]))
    Jx, _ = res.jacobians(space, x, u)
    Jx_fd, _ = fd_stage_function_jacobians(res, space, x, u)
    assert jnp.allclose(Jx, Jx_fd, atol=1e-5)


# ---------------------------------------------------------------------------
# convex support-function distances (round-5 VERDICT item 5)
# ---------------------------------------------------------------------------


def test_convex_distance_sphere_sphere():
    """Frank-Wolfe support distance matches the closed form for spheres."""
    c1, r1 = jnp.array([0.0, 0.0, 0.0]), 0.5
    c2, r2 = jnp.array([3.0, 1.0, -2.0]), 0.7
    d, x = geo.convex_distance(
        lambda dd: geo.support_sphere(c1, r1, dd),
        lambda dd: geo.support_sphere(c2, r2, dd),
        iters=40,
    )
    exact = float(jnp.linalg.norm(c1 - c2)) - (r1 + r2)
    assert float(d) == pytest.approx(exact, abs=1e-4)


def test_convex_distance_hull_point():
    """Hull (cube vertices) vs a point: matches the box SDF outside."""
    h = jnp.array([1.0, 1.0, 1.0])
    corners = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float64,
    )
    p = jnp.array([3.0, 0.2, -0.3])
    d, _ = geo.convex_distance(
        lambda dd: geo.support_hull(corners, dd),
        lambda dd: p,
        iters=40,
    )
    exact = geo.point_box_distance(p, jnp.zeros(3), jnp.eye(3), h)
    assert float(d) == pytest.approx(float(exact), abs=1e-3)


def test_capsule_box_distance_cases():
    center, rot = jnp.zeros(3), jnp.eye(3)
    h = jnp.array([1.0, 1.0, 1.0])
    # capsule above the box, vertical: separation = gap - radius
    a, b = jnp.array([0.0, 0.0, 2.0]), jnp.array([0.0, 0.0, 4.0])
    d = geo.capsule_box_distance(a, b, 0.25, center, rot, h, iters=40)
    assert float(d) == pytest.approx(1.0 - 0.25, abs=1e-3)
    # diagonal offset: closest to the corner
    a2 = jnp.array([2.0, 2.0, 2.0])
    b2 = jnp.array([3.0, 3.0, 3.0])
    d2 = geo.capsule_box_distance(a2, b2, 0.0, center, rot, h, iters=60)
    assert float(d2) == pytest.approx(float(jnp.sqrt(3.0)), abs=5e-3)
    # overlapping: converges to ~0 (no penetration depth, GJK-like)
    d3 = geo.capsule_box_distance(
        jnp.zeros(3), jnp.array([0.2, 0.0, 0.0]), 0.1, center, rot, h,
        iters=40,
    )
    assert float(d3) <= 0.0 + 1e-6


def test_convex_distance_cylinder_halfspace_and_grad():
    """Cylinder support + hull-halfspace closed form; gradients flow."""
    rot = jnp.eye(3)
    d, _ = geo.convex_distance(
        lambda dd: geo.support_cylinder(
            jnp.array([0.0, 0.0, 2.0]), rot, 0.5, 1.0, dd
        ),
        lambda dd: geo.support_box(
            jnp.zeros(3), rot, jnp.array([5.0, 5.0, 0.1]), dd
        ),
        iters=40,
    )
    assert float(d) == pytest.approx(2.0 - 1.0 - 0.1, abs=1e-3)

    verts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0], [1.0, 0.0, 2.0]])
    n = jnp.array([0.0, 0.0, 1.0])
    assert float(geo.hull_halfspace_distance(verts, n, 0.25)) == pytest.approx(
        0.75
    )

    def f(c):
        dd, _ = geo.convex_distance(
            lambda u: geo.support_sphere(c, 0.3, u),
            lambda u: geo.support_box(
                jnp.zeros(3), jnp.eye(3), jnp.ones(3), u
            ),
            iters=24,
        )
        return dd

    g = jax.grad(f)(jnp.array([4.0, 0.0, 0.0]))
    assert float(g[0]) == pytest.approx(1.0, abs=1e-3)  # moving away along x
