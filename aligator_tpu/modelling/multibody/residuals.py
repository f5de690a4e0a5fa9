"""Multibody residuals (task-space errors).

Counterparts of the reference's ``modelling/multibody`` residual zoo:
frame placement (``frame-placement.hpp:16``), frame translation
(``frame-translation.hpp:15``), frame velocity (``frame-velocity.hpp:16``),
CoM translation (``center-of-mass-translation.hpp:22``) and velocity
(``center-of-mass-velocity.hpp:13``), joint-limit box residuals. All work on
a phase-space state x = (q, v); Jacobians come from the StageFunction
autodiff default (exact, tangent-space).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.functions import StageFunction
from ..spaces.se3 import se3_log
from . import model as rbd


def _split_qv(model, x):
    nq = model.nq
    return x[..., :nq], x[..., nq:]


@pytree_dataclass
class FrameTranslationResidual(StageFunction):
    """r(x) = p_frame(q) − p_ref ∈ R³."""

    model: rbd.RobotModel
    p_ref: jax.Array
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        _, p = rbd.frame_placement(self.model, q, self.frame_id)
        return p - self.p_ref

    def jacobians(self, space, x, u):
        """Analytic: the linear rows of the LOCAL_WORLD_ALIGNED frame
        Jacobian (∂p/∂dq); zero in (v, u).  Replaces the ndx+nu-tangent
        autodiff default — this residual sits on every swing-foot tracking
        cost of the whole-body problems (round-4 derivative-phase work)."""
        q, _ = _split_qv(self.model, x)
        J = rbd.frame_jacobian_lwa(self.model, q, self.frame_id)[:3]
        dt = jnp.result_type(x)
        nv = self.model.nv
        Jx = jnp.concatenate([J, jnp.zeros((3, space.ndx - nv), dt)], axis=1)
        return Jx, jnp.zeros((3,) + u.shape, dt)


@pytree_dataclass
class FramePlacementResidual(StageFunction):
    """r(x) = log₆(M_ref⁻¹ · M_frame(q)) ∈ R⁶."""

    model: rbd.RobotModel
    R_ref: jax.Array  # (3, 3)
    p_ref: jax.Array  # (3,)
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        R, p = rbd.frame_placement(self.model, q, self.frame_id)
        R_rel = self.R_ref.T @ R
        p_rel = self.R_ref.T @ (p - self.p_ref)
        # log6 expects a quaternion: convert R_rel
        qrel = _matrix_to_quat(R_rel)
        v, w = se3_log(p_rel, qrel)
        return jnp.concatenate([v, w])

    def jacobians(self, space, x, u):
        """Analytic-hybrid: chain the 6×6 Jacobian of the log map (a tiny
        chart jacfwd at the CURRENT pose — 6 tangents through log₆ only)
        with the analytic LOCAL frame Jacobian, instead of pushing ndx+nu
        tangents through the whole FK."""
        q, _ = _split_qv(self.model, x)
        kin = rbd.kinematics(self.model, q)
        R, p = rbd.frame_placement(self.model, q, self.frame_id, kin=kin)
        J6 = rbd.frame_jacobian_lwa(self.model, q, self.frame_id, kin=kin)
        # LOCAL twist Jacobian (right-trivialized): rotate both row blocks
        J_loc = jnp.concatenate([R.T @ J6[:3], R.T @ J6[3:]], axis=0)
        dt = jnp.result_type(x)

        def log_of_xi(xi):
            # right perturbation M·exp(ξ): p' = p + R v, R' = R exp(ŵ)
            from ..spaces.se3 import exp3_quat, quat_to_matrix

            dR = quat_to_matrix(exp3_quat(xi[3:]))
            Rp = R @ dR
            pp = p + R @ xi[:3]
            R_rel = self.R_ref.T @ Rp
            p_rel = self.R_ref.T @ (pp - self.p_ref)
            v, w = se3_log(p_rel, _matrix_to_quat(R_rel))
            return jnp.concatenate([v, w])

        Jlog = jax.jacfwd(log_of_xi)(jnp.zeros((6,), dt))
        nv = self.model.nv
        Jx = jnp.concatenate(
            [Jlog @ J_loc, jnp.zeros((6, space.ndx - nv), dt)], axis=1
        )
        return Jx, jnp.zeros((6,) + u.shape, dt)


@pytree_dataclass
class FrameVelocityResidual(StageFunction):
    """r(x) = v_frame(q, v) − v_ref ∈ R⁶ (LOCAL frame)."""

    model: rbd.RobotModel
    v_ref: jax.Array
    frame_id: int = static_field(default=0)

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        return rbd.frame_velocity(self.model, q, v, self.frame_id) - self.v_ref

    def jacobians(self, space, x, u):
        from .derivatives import frame_velocity_jacobians

        q, v = _split_qv(self.model, x)
        Jq, Jv = frame_velocity_jacobians(self.model, q, v, self.frame_id)
        return (
            jnp.concatenate([Jq, Jv], axis=1),
            jnp.zeros((6,) + u.shape, jnp.result_type(x)),
        )


@pytree_dataclass
class CenterOfMassTranslationResidual(StageFunction):
    """r(x) = com(q) − p_ref ∈ R³."""

    model: rbd.RobotModel
    p_ref: jax.Array

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        return rbd.center_of_mass(self.model, q) - self.p_ref

    def jacobians(self, space, x, u):
        from .derivatives import com_jacobian

        q, _ = _split_qv(self.model, x)
        J = com_jacobian(self.model, q)
        dt = jnp.result_type(x)
        nv = self.model.nv
        Jx = jnp.concatenate([J, jnp.zeros((3, space.ndx - nv), dt)], axis=1)
        return Jx, jnp.zeros((3,) + u.shape, dt)


@pytree_dataclass
class CenterOfMassVelocityResidual(StageFunction):
    """r(x) = d/dt com(q) − v_ref ∈ R³ (via jvp through the CoM map)."""

    model: rbd.RobotModel
    v_ref: jax.Array

    def value(self, space, x, u):
        q, v = _split_qv(self.model, x)
        # dq/dt in chart coords equals v for fixed-base (vector-space) robots;
        # for floating bases the chart derivative is handled by jvp through
        # the configuration-space integrate at 0.
        cspace = self.model.configuration_space()

        def com_of_dq(dq):
            return rbd.center_of_mass(self.model, cspace.integrate(q, dq))

        z = jnp.zeros((self.model.nv,), x.dtype)
        vel = jax.jvp(com_of_dq, (z,), (v,))[1]
        return vel - self.v_ref

    def jacobians(self, space, x, u):
        from .derivatives import com_velocity_jacobians

        q, v = _split_qv(self.model, x)
        Jq, Jv = com_velocity_jacobians(self.model, q, v)
        return (
            jnp.concatenate([Jq, Jv], axis=1),
            jnp.zeros((3,) + u.shape, jnp.result_type(x)),
        )


@pytree_dataclass
class GravityCompensationResidual(StageFunction):
    """r(x, u) = B·u − g(q) (reference
    ``gravity-compensation-residual.hpp:11``)."""

    model: rbd.RobotModel
    actuation: jax.Array

    def value(self, space, x, u):
        q, _ = _split_qv(self.model, x)
        zero = jnp.zeros((self.model.nv,), x.dtype)
        grav = rbd.rnea(self.model, q, zero, zero)
        return self.actuation @ u - grav

    def jacobians(self, space, x, u):
        """Analytic: −∂g/∂dq from the RNEA derivative pass at zero
        velocity/acceleration; Ju = B."""
        from .derivatives import rnea_derivatives

        q, _ = _split_qv(self.model, x)
        zero = jnp.zeros((self.model.nv,), x.dtype)
        dg_dq, _ = rnea_derivatives(self.model, q, zero, zero)
        dt = jnp.result_type(x)
        nv = self.model.nv
        Jx = jnp.concatenate(
            [-dg_dq, jnp.zeros((nv, space.ndx - nv), dt)], axis=1
        )
        return Jx, jnp.broadcast_to(self.actuation.astype(dt),
                                    (nv,) + u.shape)


def _matrix_to_quat(R):
    """Rotation matrix → quaternion (x, y, z, w), branch-free (Shepperd's
    method via the max-trace formulation, numerically safe under autodiff)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack(
            [(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s]
        )

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack(
            [0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s]
        )

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack(
            [(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s]
        )

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack(
            [(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s]
        )

    # pick the numerically best branch
    cands = jnp.stack([tr, m00, m11, m22])
    idx = jnp.argmax(cands)
    return jax.lax.switch(idx, [case_w, case_x, case_y, case_z])
