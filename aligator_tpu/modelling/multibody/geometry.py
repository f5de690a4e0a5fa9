"""Collision-geometry signed distances + frame-collision residuals.

Counterpart of the reference frame-collision residual
(``include/aligator/modelling/multibody/frame-collision.hpp:18``), which
computes signed distances between a robot frame's geometry and arbitrary
coal/FCL geometry pairs. The pairs the reference examples actually exercise
— sphere/capsule vs sphere, halfspace (table keep-out, the
``examples/ur5_reach.py`` table variant), and box — all have cheap closed
forms, implemented here as pure differentiable functions (no GJK needed;
the piecewise-smooth clamps match hpp-fcl's primitive distances exactly).

Residual convention (matches ``extra_residuals.FrameCollisionResidual``):
``r(x) ≤ 0 ⇔ collision-free``; use with ``NegativeOrthant``. All residuals
here return the *linear* penetration ``(margin − separation)``, which is
better conditioned near contact than the squared form.

Shapes attached to a robot frame are (offset, radius[, axis/half_len])
leaves; world obstacles are plain arrays. Geometry *types* are encoded by
the residual class (static), keeping every pytree leaf numeric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.functions import StageFunction
from . import model as rbd


# ---------------------------------------------------------------------------
# pure signed-distance primitives (world-frame points/segments)
# ---------------------------------------------------------------------------


def point_halfspace_distance(p, normal, offset):
    """Signed distance of point ``p`` to the halfspace boundary
    ``{x : n·x = offset}`` (``n`` unit, positive side = free space)."""
    return jnp.dot(normal, p) - offset


def segment_halfspace_distance(a, b, normal, offset):
    """Signed distance of segment [a, b] to a halfspace boundary: the
    closest endpoint (the minimum is attained at an endpoint for a plane)."""
    return jnp.minimum(
        point_halfspace_distance(a, normal, offset),
        point_halfspace_distance(b, normal, offset),
    )


def point_box_distance(p, center, rot, half_extents, eps=1e-12):
    """Signed distance of point ``p`` to an oriented box (center, rotation
    ``rot`` world←box, half-extents). Positive outside, negative inside
    (standard SDF: ``‖max(q,0)‖ + min(max_i(q_i), 0)``, q = |p_local| − h)."""
    p_local = rot.T @ (p - center)
    q = jnp.abs(p_local) - half_extents
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2) + eps) - jnp.sqrt(eps)
    inside = jnp.minimum(jnp.max(q), 0.0)
    return outside + inside


def point_segment_distance(p, a, b, eps=1e-12):
    """Distance of point ``p`` to segment [a, b] (clamped projection)."""
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), eps), 0.0, 1.0)
    return jnp.sqrt(jnp.sum((p - (a + t * ab)) ** 2) + eps)


def sphere_sphere_distance(c1, r1, c2, r2, eps=1e-12):
    """Separation between two spheres (negative ⇔ overlapping)."""
    return jnp.sqrt(jnp.sum((c1 - c2) ** 2) + eps) - (r1 + r2)


# ---------------------------------------------------------------------------
# frame-attached residuals
# ---------------------------------------------------------------------------


def _split_qv(model, x):
    nq = model.nq
    return x[..., :nq], x[..., nq:]


@pytree_dataclass
class FrameHalfspaceResidual(StageFunction):
    """Keep-out halfspace (table/wall/floor): a sphere or capsule attached
    to a robot frame must stay on the positive side of the plane
    ``{x : n·x = plane_offset}`` by at least ``margin``.

    r(x) = margin − (dist(shape(q), plane) − radius) ≤ 0 ⇔ clear.
    With ``half_len = 0`` the shape is a sphere at ``frame ⊕ offset``;
    otherwise a capsule with endpoints ``frame ⊕ (offset ± half_len·axis)``.

    Role of the reference ``frame-collision.hpp:18`` with a coal::Halfspace
    obstacle (the ``ur5_reach.py`` table variant).
    """

    model: rbd.RobotModel
    normal: jax.Array  # (3,) unit outward plane normal (world)
    plane_offset: jax.Array  # scalar: plane is {x : n·x = plane_offset}
    offset: jax.Array  # (3,) shape center in the frame
    radius: jax.Array  # scalar
    axis: jax.Array  # (3,) capsule axis in the frame
    half_len: jax.Array  # scalar; 0 → sphere
    margin: jax.Array  # scalar
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        R, p = rbd.frame_placement(self.model, q, self.frame_id)
        c = p + R @ self.offset
        a_w = R @ (self.axis * self.half_len)
        d = segment_halfspace_distance(
            c - a_w, c + a_w, self.normal, self.plane_offset
        )
        return (self.margin - (d - self.radius))[None]


@pytree_dataclass
class FrameSphereResidual(StageFunction):
    """Sphere attached to a robot frame vs a fixed world sphere obstacle:
    r(x) = margin − (‖c(q) − c_obs‖ − r − r_obs) ≤ 0 ⇔ clear.

    Reference ``frame-collision.hpp:18`` with a coal::Sphere obstacle.
    """

    model: rbd.RobotModel
    center_obs: jax.Array  # (3,) obstacle center (world)
    radius_obs: jax.Array
    offset: jax.Array  # (3,) sphere center in the frame
    radius: jax.Array
    margin: jax.Array
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        R, p = rbd.frame_placement(self.model, q, self.frame_id)
        c = p + R @ self.offset
        d = sphere_sphere_distance(c, self.radius, self.center_obs, self.radius_obs)
        return (self.margin - d)[None]


@pytree_dataclass
class FrameBoxResidual(StageFunction):
    """Sphere attached to a robot frame vs a fixed oriented world box:
    r(x) = margin − (sdf_box(c(q)) − r) ≤ 0 ⇔ clear.

    Reference ``frame-collision.hpp:18`` with a coal::Box obstacle.
    """

    model: rbd.RobotModel
    box_center: jax.Array  # (3,)
    box_rot: jax.Array  # (3, 3) world←box
    half_extents: jax.Array  # (3,)
    offset: jax.Array  # (3,) sphere center in the frame
    radius: jax.Array
    margin: jax.Array
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        R, p = rbd.frame_placement(self.model, q, self.frame_id)
        c = p + R @ self.offset
        d = point_box_distance(c, self.box_center, self.box_rot, self.half_extents)
        return (self.margin - (d - self.radius))[None]


@pytree_dataclass
class FrameSphereSphereResidual(StageFunction):
    """Self-collision between spheres attached to two robot frames:
    r(x) = margin − (‖c₁(q) − c₂(q)‖ − r₁ − r₂) ≤ 0 ⇔ clear.

    Sphere-pair special case of the reference fork's FCL self-collision
    constraints (``dual-FFSR_ProxDDP/main3.py:410-563``); the capsule-pair
    version is ``extra_residuals.LinkCollisionResidual``.
    """

    model: rbd.RobotModel
    offset1: jax.Array  # (3,) in frame 1
    radius1: jax.Array
    offset2: jax.Array  # (3,) in frame 2
    radius2: jax.Array
    margin: jax.Array
    frame_id1: int = static_field(default=0)
    frame_id2: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        kin = rbd.kinematics(self.model, q)
        R1, p1 = rbd.frame_placement(self.model, q, self.frame_id1, kin=kin)
        R2, p2 = rbd.frame_placement(self.model, q, self.frame_id2, kin=kin)
        c1 = p1 + R1 @ self.offset1
        c2 = p2 + R2 @ self.offset2
        d = sphere_sphere_distance(c1, self.radius1, c2, self.radius2)
        return (self.margin - d)[None]
