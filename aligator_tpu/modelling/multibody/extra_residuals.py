"""Additional multibody residuals.

Counterparts of the reference's remaining ``modelling/multibody`` zoo:
frame collision distance (``frame-collision.hpp:18``), fly-high
(``fly-high.hpp:12``), DCM position (``dcm-position.hpp:13``), whole-body
centroidal momentum (``centroidal-momentum.hpp:18``) and its derivative
(``centroidal-momentum-derivative.hpp:17``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.functions import StageFunction
from . import model as rbd


def _split_qv(model, x):
    nq = model.nq
    return x[..., :nq], x[..., nq:]


@pytree_dataclass
class FrameCollisionResidual(StageFunction):
    """Signed distance between a frame point and a capsule/sphere obstacle:
    r(x) = ‖p_frame − proj_segment(p_frame)‖² − (r_obs + margin)² ≤ 0 means
    COLLIDING; use with NegativeOrthant on −r to keep clear (reference
    ``frame-collision.hpp:18`` computes capsule distance via hpp-fcl).

    Convention here: r(x) = (r_min)² − d² so r ≤ 0 ⇔ collision-free.
    """

    model: rbd.RobotModel
    seg_a: jax.Array  # (3,) capsule segment endpoint A (world)
    seg_b: jax.Array  # (3,) endpoint B
    radius: jax.Array  # capsule radius + margin
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        _, p = rbd.frame_placement(self.model, q, self.frame_id)
        ab = self.seg_b - self.seg_a
        t = jnp.clip(
            jnp.dot(p - self.seg_a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12),
            0.0,
            1.0,
        )
        closest = self.seg_a + t * ab
        d2 = jnp.sum((p - closest) ** 2)
        return (self.radius**2 - d2)[None]


@pytree_dataclass
class FlyHighResidual(StageFunction):
    """r(x) = v_xy(frame) · exp(−z/δ) — penalizes horizontal foot velocity
    near the ground (reference ``fly-high.hpp:12``)."""

    model: rbd.RobotModel
    slope: jax.Array  # δ
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        R, p = rbd.frame_placement(self.model, q, self.frame_id)
        vel = rbd.frame_velocity(self.model, q, v, self.frame_id)
        v_w = R @ vel[:3]
        scale = jnp.exp(-p[2] / self.slope)
        return v_w[:2] * scale


@pytree_dataclass
class DCMPositionResidual(StageFunction):
    """Divergent component of motion: r(x) = c + ċ/ω − ref (reference
    ``dcm-position.hpp:13``), ω = sqrt(g/h)."""

    model: rbd.RobotModel
    omega_inv: jax.Array  # 1/ω
    ref: jax.Array  # (3,)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        com = rbd.center_of_mass(self.model, q)
        cspace = self.model.configuration_space()

        def com_of_dq(dq):
            return rbd.center_of_mass(self.model, cspace.integrate(q, dq))

        z = jnp.zeros((self.model.nv,), x.dtype)
        vcom = jax.jvp(com_of_dq, (z,), (v,))[1]
        return com + self.omega_inv * vcom - self.ref


def centroidal_momentum(model: rbd.RobotModel, q, v):
    """Whole-body centroidal momentum h = (linear, angular about the CoM),
    world frame (role of Pinocchio's ``computeCentroidalMomentum``)."""
    fk = rbd.forward_kinematics(model, q, v)
    com = rbd.center_of_mass(model, q)
    lin = jnp.zeros(3, q.dtype)
    ang = jnp.zeros(3, q.dtype)
    for i in range(model.njoints):
        R, p = fk["R"][i], fk["p"][i]
        vel = fk["vel"][i]  # body frame (linear, angular) at joint origin
        w_w = R @ vel[3:]
        v_w = R @ vel[:3]
        c_local = model.com[i].astype(q.dtype)
        c_w = p + R @ c_local
        # com point velocity
        v_com = v_w + jnp.cross(w_w, R @ c_local)
        pi = model.mass[i] * v_com
        I_w = R @ model.inertia[i].astype(q.dtype) @ R.T
        Li = I_w @ w_w + jnp.cross(c_w - com, pi)
        lin = lin + pi
        ang = ang + Li
    return jnp.concatenate([lin, ang])


@pytree_dataclass
class CentroidalMomentumResidual(StageFunction):
    """r(x) = h(q, v) − h_ref (reference ``centroidal-momentum.hpp:18``)."""

    model: rbd.RobotModel
    h_ref: jax.Array  # (6,)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        return centroidal_momentum(self.model, q, v) - self.h_ref


@pytree_dataclass
class CentroidalMomentumDerivativeResidual(StageFunction):
    """r(x, u) = ḣ(q, v, a(x, u)) − ḣ_ref with a from free forward dynamics
    (reference ``centroidal-momentum-derivative.hpp:17``)."""

    model: rbd.RobotModel
    actuation: jax.Array
    h_ref: jax.Array  # (6,)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        tau = self.actuation @ u
        a = rbd.aba(self.model, q, v, tau)
        cspace = self.model.configuration_space()

        def h_of(dq, vv):
            return centroidal_momentum(self.model, cspace.integrate(q, dq), vv)

        z = jnp.zeros((self.model.nv,), x.dtype)
        # ḣ = ∂h/∂q·v + ∂h/∂v·a
        _, dh = jax.jvp(h_of, (z, v), (v, a))
        return dh - self.h_ref


def _segment_segment_sqdist(p1, q1, p2, q2, eps=1e-12):
    """Squared distance between segments [p1,q1] and [p2,q2] (Ericson's
    clamped closest-point algorithm, differentiable through jnp.clip —
    piecewise-smooth exactly like the hpp-fcl capsule distance the reference
    uses)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    # parallel-safe: when denom ~ 0 pick s = 0
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, eps)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-clamp s for the clamped t (one Gauss-Seidel pass is exact here)
    s = jnp.where(
        jnp.abs(t - t_cl) > 0.0,
        jnp.clip((t_cl * b - c) / jnp.maximum(a, eps), 0.0, 1.0),
        s,
    )
    diff = (p1 + s * d1) - (p2 + t_cl * d2)
    return jnp.dot(diff, diff)


@pytree_dataclass
class LinkCollisionResidual(StageFunction):
    """Self-collision between two capsules attached to robot frames:
    r(x) = (r₁ + r₂ + margin)² − d²(capsule₁(q), capsule₂(q)), so r ≤ 0 ⇔
    collision-free (use with NegativeOrthant).

    Counterpart of the reference fork's FCL self-collision constraints
    (``dual-FFSR_ProxDDP/main3.py:410-563`` builds group-level residuals
    from hpp-fcl witness pairs; reference ``frame-collision.hpp:18`` is the
    frame-vs-environment variant). Each capsule is a segment in its frame:
    endpoints ``frame ⊕ (offset ± half_len·axis)`` with radius ``radius``.
    """

    model: rbd.RobotModel
    axis1: jax.Array  # (3,) capsule 1 axis in frame 1
    half_len1: jax.Array
    radius1: jax.Array
    axis2: jax.Array  # (3,) capsule 2 axis in frame 2
    half_len2: jax.Array
    radius2: jax.Array
    offset1: jax.Array  # (3,) capsule 1 center offset in frame 1
    offset2: jax.Array
    margin: jax.Array
    frame_id1: int = static_field(default=0)
    frame_id2: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        kin = rbd.kinematics(self.model, q)
        R1, p1 = rbd.frame_placement(self.model, q, self.frame_id1, kin=kin)
        R2, p2 = rbd.frame_placement(self.model, q, self.frame_id2, kin=kin)
        c1 = p1 + R1 @ self.offset1
        a1 = R1 @ (self.axis1 * self.half_len1)
        c2 = p2 + R2 @ self.offset2
        a2 = R2 @ (self.axis2 * self.half_len2)
        d2 = _segment_segment_sqdist(c1 - a1, c1 + a1, c2 - a2, c2 + a2)
        rmin = self.radius1 + self.radius2 + self.margin
        return (rmin**2 - d2)[None]


@pytree_dataclass
class BallisticLandingResidual(StageFunction):
    """Landing point of a projectile released from a frame at the current
    state: r(x) = landing_xy(q, v) − target_xy ∈ R².

    The point flies ballistically from the frame origin with the frame's
    world linear velocity until it crosses z = z_ground:
    ``t_f = (v_z + √(v_z² + 2 g (p_z − z_ground)))/g``. Role of the
    reference's throwing task (``examples/ur10_ballistic.py`` constrains the
    ball frame, simulated as a free-flyer after release, to the target); the
    release-state landing map collapses the free-flight phase analytically.
    """

    model: rbd.RobotModel
    target_xy: jax.Array  # (2,)
    gravity: jax.Array  # scalar, positive (9.81)
    z_ground: jax.Array  # scalar
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        kin = rbd.kinematics(self.model, q, v)
        R, p = rbd.frame_placement(self.model, q, self.frame_id, kin=kin)
        V = rbd.frame_velocity(self.model, q, v, self.frame_id, kin=kin)
        v_w = R @ V[:3]
        g = self.gravity
        dz = jnp.maximum(p[2] - self.z_ground, 0.0)
        disc = jnp.maximum(v_w[2] ** 2 + 2.0 * g * dz, 1e-12)
        tf = (v_w[2] + jnp.sqrt(disc)) / g
        landing = p[:2] + v_w[:2] * tf
        return landing - self.target_xy
