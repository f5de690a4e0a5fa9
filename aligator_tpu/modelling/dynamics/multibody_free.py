"""Free (unconstrained) multibody forward dynamics.

Counterpart of ``MultibodyFreeFwdDynamicsTpl`` (reference
``modelling/dynamics/multibody-free-fwd.hpp:25``): phase-space ODE
``(q̇, v̇) = (v, FD(q, v, B·u))`` with an actuation matrix B. The reference
calls Pinocchio's ABA; here the JAX rigid-body layer provides it, and
derivatives come from autodiff instead of analytical ABA derivatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass
from ..multibody import model as rbd
from .ode import ODE


@pytree_dataclass
class MultibodyFreeFwdDynamics(ODE):
    model: rbd.RobotModel
    actuation: jax.Array  # (nv, nu)

    def xdot(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = self.actuation @ u
        a = rbd.aba(self.model, q, v, tau)
        # tangent of the phase space = (dq, dv)
        return jnp.concatenate([v, a], axis=-1)

    def acc_derivatives(self, space, x, u):
        """Analytic (a, ∂a/∂dq, ∂a/∂dv, ∂a/∂u) in tangent coordinates —
        the direct-assembly protocol consumed by
        ``IntegratorSemiImplEuler.jacobians`` (one derivative-matrix pass
        per stage instead of ndx+nu forward tangents)."""
        from ..multibody.derivatives import aba_derivatives

        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        a, da_dq, da_dv, solve_M = aba_derivatives(
            self.model, q, v, self.actuation @ u
        )
        return a, da_dq, da_dv, solve_M(self.actuation)


@pytree_dataclass
class MultibodyGravityCompensatedDynamics(ODE):
    """Velocity-damped, gravity-compensated variant (useful for kinematic
    reaching tasks): v̇ = FD(q, v, g(q) + B·u)."""

    model: rbd.RobotModel
    actuation: jax.Array

    def xdot(self, space, x, u):
        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        zero = jnp.zeros_like(v)
        grav = rbd.rnea(self.model, q, zero, zero)
        tau = grav + self.actuation @ u
        a = rbd.aba(self.model, q, v, tau)
        return jnp.concatenate([v, a], axis=-1)


@pytree_dataclass
class MultibodyFlexibleFwdDynamics(ODE):
    """Multibody dynamics with passive joint elasticity:
    ``v̇ = FD(q, v, B·u − K(q − q_rest) − D·v)``.

    Role of the reference's flexible double pendulum
    (``examples/flexible_double_pendulum.py``): link flexibility modeled as
    extra revolute segments coupled by torsional spring-dampers (K, D
    diagonal over the tangent space; actuated dofs selected by B). Requires
    a fixed-base model with nq == nv (revolute/prismatic joints only).
    """

    model: rbd.RobotModel
    actuation: jax.Array  # (nv, nu)
    stiffness: jax.Array  # (nv,) torsional spring constants
    damping: jax.Array  # (nv,) viscous joint damping
    q_rest: jax.Array  # (nq,) spring rest configuration

    def xdot(self, space, x, u):
        nq = self.model.nq
        if nq != self.model.nv:
            raise ValueError("flexible dynamics needs nq == nv (no free-flyer)")
        q, v = x[..., :nq], x[..., nq:]
        tau = (
            self.actuation @ u
            - self.stiffness * (q - self.q_rest)
            - self.damping * v
        )
        a = rbd.aba(self.model, q, v, tau)
        return jnp.concatenate([v, a], axis=-1)

    def acc_derivatives(self, space, x, u):
        """Analytic acceleration derivatives; the passive spring-damper
        torque contributes −M⁻¹K / −M⁻¹D through the τ channel (nq == nv,
        so q-tangent coords coincide with q)."""
        from ..multibody.derivatives import aba_derivatives

        nq = self.model.nq
        q, v = x[..., :nq], x[..., nq:]
        tau = (
            self.actuation @ u
            - self.stiffness * (q - self.q_rest)
            - self.damping * v
        )
        a, da_dq, da_dv, solve_M = aba_derivatives(self.model, q, v, tau)
        nv = self.model.nv
        dt = q.dtype
        KD_B = jnp.concatenate(
            [
                -jnp.diag(self.stiffness.astype(dt)),
                -jnp.diag(self.damping.astype(dt)),
                self.actuation.astype(dt),
            ],
            axis=1,
        )
        Minv_KDB = solve_M(KD_B)
        return (
            a,
            da_dq + Minv_KDB[:, :nv],
            da_dv + Minv_KDB[:, nv : 2 * nv],
            Minv_KDB[:, 2 * nv :],
        )
