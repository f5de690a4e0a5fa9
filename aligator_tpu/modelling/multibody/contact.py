"""Contact-constrained forward dynamics.

Counterpart of ``MultibodyConstraintFwdDynamicsTpl`` (reference
``modelling/dynamics/multibody-constraint-fwd.hpp:20``), which calls
Pinocchio's constrained-dynamics solver with ``RigidConstraintModel`` and
prox settings. Here: 3D point contacts in the LOCAL_WORLD_ALIGNED frame,
solved as a proximally-regularized KKT system

    [[M,  Jᶜᵀ], [Jᶜ, −μI]] [a; −λ] = [τ − b; −(γ + Baumgarte)]

via a Cholesky Schur complement (the μ-regularization mirrors Pinocchio's
``ProximalSettings`` and keeps the system solvable for redundant contacts).
Contact activity is a per-contact 0/1 flag array — rows of inactive contacts
are masked (μ-dominated), so contact *schedules* can vary per stage through
stacked stage parameters without shape changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ..dynamics.ode import ODE
from . import model as rbd


def frame_point_and_world_velocity(model, q, v, frame_id):
    """World position p(q) and world-frame linear velocity of a frame origin."""
    R, p = rbd.frame_placement(model, q, frame_id)
    vel_local = rbd.frame_velocity(model, q, v, frame_id)
    return p, R @ vel_local[:3]


def contact_jacobian(model, q, frame_id):
    """LOCAL_WORLD_ALIGNED 3×nv contact Jacobian: ∂(world point velocity)/∂v."""
    def vw(vv):
        _, vel = frame_point_and_world_velocity(model, q, vv, frame_id)
        return vel

    return jax.jacfwd(vw)(jnp.zeros((model.nv,), q.dtype))


def contact_drift(model, q, v, frame_id):
    """γ = d/dt(Jᶜ v) at zero joint acceleration (point acceleration drift)."""
    cspace = model.configuration_space()

    def vw_of_dq(dq):
        qq = cspace.integrate(q, dq)
        _, vel = frame_point_and_world_velocity(model, qq, v, frame_id)
        return vel

    z = jnp.zeros((model.nv,), q.dtype)
    return jax.jvp(vw_of_dq, (z,), (v,))[1]


def constrained_fwd_dynamics(
    model,
    q,
    v,
    tau,
    contact_frames,
    active,
    prox_mu=1e-8,
    kp=0.0,
    kd=0.0,
    p_refs=None,
):
    """Forward dynamics under active 3D point contacts.

    Returns ``(a, forces)`` with forces (n_contacts, 3) in world-aligned
    coordinates (zero rows for inactive contacts).
    """
    dtype = q.dtype
    nv = model.nv
    M = rbd.mass_matrix(model, q)
    b = rbd.rnea(model, q, v, jnp.zeros((nv,), dtype))
    free = tau - b

    Js, gammas = [], []
    for k, fid in enumerate(contact_frames):
        J = contact_jacobian(model, q, fid)
        g = contact_drift(model, q, v, fid)
        # Baumgarte stabilization on position/velocity drift
        p, vw = frame_point_and_world_velocity(model, q, v, fid)
        corr = kd * vw
        if p_refs is not None:
            corr = corr + kp * (p - p_refs[k])
        Js.append(J)
        gammas.append(g + corr)
    Jc = jnp.concatenate(Js, axis=0)  # (3*nc, nv)
    gamma = jnp.concatenate(gammas, axis=0)

    act = jnp.repeat(jnp.asarray(active, dtype), 3)
    Jc = Jc * act[:, None]
    gamma = gamma * act

    cM = jax.scipy.linalg.cho_factor(M, lower=True)
    MinvJt = jax.scipy.linalg.cho_solve(cM, Jc.T)  # (nv, 3nc)
    a_free = jax.scipy.linalg.cho_solve(cM, free)

    # Delassus operator with prox regularization; inactive rows reduce to
    # μ·λ = 0 → λ = 0.
    G = Jc @ MinvJt + prox_mu * jnp.eye(Jc.shape[0], dtype=dtype)
    rhs = Jc @ a_free + gamma
    cG = jax.scipy.linalg.cho_factor(0.5 * (G + G.T), lower=True)
    lam = jax.scipy.linalg.cho_solve(cG, rhs)  # contact impulses (= -forces·?)

    a = a_free - MinvJt @ lam
    forces = -lam.reshape((-1, 3)) * 1.0
    return a, forces


@pytree_dataclass
class MultibodyConstraintFwdDynamics(ODE):
    """Phase-space ODE with contact-constrained accelerations.

    ``active`` is a data leaf: stack it over stages to encode a contact
    schedule (e.g. flight phases in a jump).
    """

    model: rbd.RobotModel
    actuation: jax.Array  # (nv, nu)
    active: jax.Array  # (n_contacts,)
    contact_frames: tuple = static_field(default=())
    prox_mu: float = static_field(default=1e-8)
    kd: float = static_field(default=1e-2)

    def xdot(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = self.actuation @ u
        a, _ = constrained_fwd_dynamics(
            self.model,
            q,
            v,
            tau,
            self.contact_frames,
            self.active,
            prox_mu=self.prox_mu,
            kd=self.kd,
        )
        return jnp.concatenate([v, a], axis=-1)


@pytree_dataclass
class ContactForceResidual:
    """r(x, u) = f_k(x, u) − f_ref for contact k (reference
    ``modelling/multibody/contact-force.hpp:20``). The force is recovered
    from the constrained-dynamics KKT solve."""

    model: rbd.RobotModel
    actuation: jax.Array
    active: jax.Array
    f_ref: jax.Array  # (3,)
    contact_frames: tuple = static_field(default=())
    contact_id: int = static_field(default=0)
    prox_mu: float = static_field(default=1e-8)

    def value(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = self.actuation @ u
        _, forces = constrained_fwd_dynamics(
            self.model, q, v, tau, self.contact_frames, self.active,
            prox_mu=self.prox_mu,
        )
        return forces[self.contact_id] - self.f_ref

    def jacobians(self, space, x, u):
        from ...core.functions import StageFunction

        return StageFunction.jacobians(self, space, x, u)


@pytree_dataclass
class MultibodyFrictionConeResidual:
    """Linearized friction cone on a contact force (reference
    ``modelling/multibody/multibody-friction-cone.hpp:19``):
    r ≤ 0 ⇔ force inside the pyramid."""

    model: rbd.RobotModel
    actuation: jax.Array
    active: jax.Array
    mu_friction: jax.Array
    contact_frames: tuple = static_field(default=())
    contact_id: int = static_field(default=0)
    prox_mu: float = static_field(default=1e-8)

    def value(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = self.actuation @ u
        _, forces = constrained_fwd_dynamics(
            self.model, q, v, tau, self.contact_frames, self.active,
            prox_mu=self.prox_mu,
        )
        f = forces[self.contact_id]
        fx, fy, fz = f[0], f[1], f[2]
        m = self.mu_friction
        return jnp.stack(
            [-fz, fx - m * fz, -fx - m * fz, fy - m * fz, -fy - m * fz]
        )

    def jacobians(self, space, x, u):
        from ...core.functions import StageFunction

        return StageFunction.jacobians(self, space, x, u)
