"""Continuous dynamics (ODEs) and explicit integrators.

Counterparts of the reference's ``modelling/dynamics`` layer:
``ODEAbstractTpl`` (``ode-abstract.hpp:15``), explicit Euler
(``integrator-euler.hpp:14``), semi-implicit Euler
(``integrator-semi-euler.hpp:17``) and RK2 (``integrator-rk2.hpp:19``).

An ODE provides ``xdot(space, x, u) ∈ T_x M`` (tangent coordinates, size
ndx); integrators are :class:`~aligator_tpu.core.dynamics.ExplicitDynamics`
that advance along the manifold with ``space.integrate``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.dynamics import ExplicitDynamics
from ...core.manifolds import Manifold, TangentBundle


class ContinuousDynamics:
    """Implicit continuous dynamics (DAE) ``r(x, u, ẋ) = 0`` (reference
    ``ContinuousDynamicsAbstractTpl``,
    ``modelling/dynamics/continuous-dynamics-abstract.hpp:19``).

    The general DAE surface: an ODE is the special case
    ``r = ẋ - f(x, u)``. Implicit integrators (e.g.
    :class:`IntegratorMidpoint`) consume the residual form directly.
    """

    def residual(self, space: Manifold, x, u, xdot):
        raise NotImplementedError


class ODE(ContinuousDynamics):
    """Continuous dynamics ẋ = f(x, u) in tangent coordinates (reference
    ``ODEAbstractTpl``, ``modelling/dynamics/ode-abstract.hpp:15``)."""

    def xdot(self, space: Manifold, x, u):
        raise NotImplementedError

    def residual(self, space, x, u, xdot):
        return xdot - self.xdot(space, x, u)


@pytree_dataclass
class LinearODE(ODE):
    """ẋ = A x + B u + c on a vector space (reference
    ``modelling/dynamics/linear-ode.hpp:14``)."""

    A: jax.Array
    B: jax.Array
    c: jax.Array

    def xdot(self, space, x, u):
        return self.A @ x + self.B @ u + self.c


@pytree_dataclass
class IntegratorEuler(ExplicitDynamics):
    """x⁺ = x ⊕ (h·f(x,u)) — explicit Euler (reference
    ``integrator-euler.hpp:14``)."""

    ode: ODE
    timestep: jax.Array

    def forward(self, space, x, u):
        return space.integrate(x, self.timestep * self.ode.xdot(space, x, u))


@pytree_dataclass
class IntegratorSemiImplEuler(ExplicitDynamics):
    """Semi-implicit (symplectic) Euler on a tangent bundle (q, v):
    v⁺ = v + h·a(x,u); q⁺ = q ⊕ h·v⁺ (reference
    ``integrator-semi-euler.hpp:17``). The ODE's xdot = (v, a).

    When the ODE implements the ``acc_derivatives`` protocol (the
    multibody dynamics do — analytic RBD derivatives,
    ``multibody/derivatives.py``), :meth:`jacobians` assembles the
    discrete (A, B, E) directly from the acceleration derivative
    matrices and the manifold chart Jacobians — one derivative pass +
    a handful of ndx-sized products per stage instead of ndx+nu forward
    tangents (the round-4 whole-body derivative-phase lever)."""

    ode: ODE
    timestep: jax.Array

    def forward(self, space, x, u):
        assert isinstance(space, TangentBundle), (
            "semi-implicit Euler requires a TangentBundle state space"
        )
        nv = space.base.ndx
        xdot = self.ode.xdot(space, x, u)
        acc = xdot[..., nv:]
        v_next = x[..., space.base.nx :] + self.timestep * acc
        q_next = space.base.integrate(
            x[..., : space.base.nx], self.timestep * v_next
        )
        return jnp.concatenate([q_next, v_next], axis=-1)

    def jacobians(self, space, x, u, y):
        acc_fn = getattr(self.ode, "acc_derivatives", None)
        if acc_fn is None or not isinstance(space, TangentBundle):
            return ExplicitDynamics.jacobians(self, space, x, u, y)
        base = space.base
        nq, nv = base.nx, base.ndx
        dt = jnp.result_type(x)
        h = self.timestep

        a, da_dq, da_dv, da_du = acc_fn(space, x, u)
        v_next = x[..., nq:] + h * a
        hv = h * v_next
        q_x = x[..., :nq]
        q_next = base.integrate(q_x, hv)

        # chart Jacobians (tangent coords), one evaluation per stage
        J1 = base.jintegrate(q_x, hv, 0)  # ∂ξ_{q+}/∂dq_x
        J2 = base.jintegrate(q_x, hv, 1)  # ∂ξ_{q+}/∂(h v+)
        y_q = y[..., :nq]
        Jd0 = base.jdifference(y_q, q_next, 0)  # residual wrt dq_y
        Jd1 = base.jdifference(y_q, q_next, 1)  # residual wrt ξ_{q+}

        h2 = h * h
        eye = jnp.eye(nv, dtype=dt)
        Jd1J2 = Jd1 @ J2
        A = jnp.block(
            [
                [Jd1 @ J1 + h2 * (Jd1J2 @ da_dq),
                 Jd1J2 @ (h * eye + h2 * da_dv)],
                [h * da_dq, eye + h * da_dv],
            ]
        )
        B = jnp.concatenate([h2 * (Jd1J2 @ da_du), h * da_du], axis=0)
        E = jnp.block(
            [
                [Jd0, jnp.zeros((nv, nv), dt)],
                [jnp.zeros((nv, nv), dt), -eye],
            ]
        )
        return A, B, E


@pytree_dataclass
class IntegratorRK2(ExplicitDynamics):
    """Explicit midpoint RK2 (reference ``integrator-rk2.hpp:19``):
    x₁ = x ⊕ (h/2·f(x,u)); x⁺ = x ⊕ (h·f(x₁,u))."""

    ode: ODE
    timestep: jax.Array

    def forward(self, space, x, u):
        h = self.timestep
        k1 = self.ode.xdot(space, x, u)
        x1 = space.integrate(x, 0.5 * h * k1)
        k2 = self.ode.xdot(space, x1, u)
        return space.integrate(x, h * k2)


@pytree_dataclass
class IntegratorRK4(ExplicitDynamics):
    """Classic RK4 on the manifold (tangent increments composed via ⊕)."""

    ode: ODE
    timestep: jax.Array

    def forward(self, space, x, u):
        h = self.timestep
        k1 = self.ode.xdot(space, x, u)
        k2 = self.ode.xdot(space, space.integrate(x, 0.5 * h * k1), u)
        k3 = self.ode.xdot(space, space.integrate(x, 0.5 * h * k2), u)
        k4 = self.ode.xdot(space, space.integrate(x, h * k3), u)
        return space.integrate(x, (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4))


@pytree_dataclass
class IntegratorMidpoint(ExplicitDynamics):
    """Implicit midpoint rule (reference ``integrator-midpoint.hpp:28``):
    residual r(x, u, y) = (y ⊖ x) − h·f(mid(x, y), u) = 0, solved by Newton
    in :meth:`forward` (symplectic, 2nd order, good for stiff/conservative
    systems)."""

    ode: ODE
    timestep: jax.Array
    newton_iters: int = static_field(default=5)

    @property
    def is_explicit(self) -> bool:
        return False

    def residual(self, space, x, u, y):
        mid = space.interpolate(x, y, 0.5)
        return space.difference(x, y) - self.timestep * self.ode.xdot(space, mid, u)

    def forward_with_gap(self, space, x, u, gap=None, iters=None):
        iters = self.newton_iters if iters is None else iters

        def body(y, _):
            r = self.residual(space, x, u, y)
            if gap is not None:
                r = r + gap
            dt = jnp.result_type(x)

            def f_dy(dy):
                rr = self.residual(space, x, u, space.integrate(y, dy))
                return rr + gap if gap is not None else rr

            E = jax.jacfwd(f_dy)(jnp.zeros((space.ndx,), dt))
            dy = -jnp.linalg.solve(E, r)
            return space.integrate(y, dy), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    def forward(self, space, x, u):
        return self.forward_with_gap(space, x, u, None)
