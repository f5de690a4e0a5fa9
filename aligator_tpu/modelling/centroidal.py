"""Centroidal residuals.

Counterparts of the reference ``modelling/centroidal/`` zoo: CoM residual
(``centroidal-translation.hpp:10``), linear/angular momentum
(``linear-momentum.hpp:19``, ``angular-momentum.hpp:19``),
centroidal/angular acceleration (``centroidal-acceleration.hpp:22``,
``angular-acceleration.hpp:22``), friction cone
(``centroidal-friction-cone.hpp:22``) and wrench cone
(``centroidal-wrench-cone.hpp:23``). State convention x = (c, h, L, ...),
u = stacked contact forces (see
:class:`~aligator_tpu.modelling.dynamics.centroidal.CentroidalFwdDynamics`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from ..core.functions import StageFunction
from .dynamics.centroidal import ContactMap


@pytree_dataclass
class CentroidalCoMResidual(StageFunction):
    """r(x) = c − c_ref."""

    c_ref: jax.Array

    def value(self, space, x, u):
        return x[..., 0:3] - self.c_ref


@pytree_dataclass
class LinearMomentumResidual(StageFunction):
    """r(x) = h − h_ref."""

    h_ref: jax.Array

    def value(self, space, x, u):
        return x[..., 3:6] - self.h_ref


@pytree_dataclass
class AngularMomentumResidual(StageFunction):
    """r(x) = L − L_ref."""

    L_ref: jax.Array

    def value(self, space, x, u):
        return x[..., 6:9] - self.L_ref


@pytree_dataclass
class CentroidalAccelerationResidual(StageFunction):
    """r(x, u) = ḣ/m − a_ref = g + (Σ fᵢ)/m − a_ref."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array
    a_ref: jax.Array

    def value(self, space, x, u):
        forces = u[..., : 3 * self.contact_map.n_contacts].reshape((-1, 3))
        act = self.contact_map.active[..., None]
        f_tot = jnp.sum(act * forces, axis=-2)
        return self.gravity + f_tot / self.mass - self.a_ref


@pytree_dataclass
class AngularAccelerationResidual(StageFunction):
    """r(x, u) = L̇ = Σ (pᵢ − c) × fᵢ − ref."""

    contact_map: ContactMap
    ref: jax.Array

    def value(self, space, x, u):
        c = x[..., 0:3]
        forces = u[..., : 3 * self.contact_map.n_contacts].reshape((-1, 3))
        act = self.contact_map.active[..., None]
        return (
            jnp.sum(
                act
                * jnp.cross(self.contact_map.points - c[..., None, :], forces),
                axis=-2,
            )
            - self.ref
        )


@pytree_dataclass
class CentroidalFrictionConeResidual(StageFunction):
    """Linearized friction cone for contact k: r(u) ≤ 0 with
    r = (−fz + εz, |fx| − μ fz, |fy| − μ fz) (4 rows, inner pyramid
    approximation — reference ``centroidal-friction-cone.hpp:22``).

    ``active`` gates the rows: the reference attaches cone constraints only
    to stages whose contact is active (type-heterogeneous stages,
    ``examples/centroidal.py:164-171``); here stages are homogeneous stacked
    pytrees, so an inactive contact instead zeroes its rows (r = 0,
    trivially feasible) — the stage-varying mask idiom."""

    mu: jax.Array
    eps: jax.Array
    active: jax.Array = 1.0
    contact_id: int = static_field(default=0)

    def value(self, space, x, u):
        f = u[..., 3 * self.contact_id : 3 * self.contact_id + 3]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        return jnp.asarray(self.active) * jnp.stack(
            [
                -fz + self.eps,
                fx - self.mu * fz,
                -fx - self.mu * fz,
                fy - self.mu * fz,
                -fy - self.mu * fz,
            ],
            axis=-1,
        )


@pytree_dataclass
class CentroidalWrenchConeResidual(StageFunction):
    """Contact wrench cone for a rectangular foot (half-lengths hl_x, hl_y):
    friction pyramid + CoP-in-support-polygon rows (reference
    ``centroidal-wrench-cone.hpp:23``). Input per contact: wrench (f, τ)."""

    mu: jax.Array
    half_length_x: jax.Array
    half_length_y: jax.Array
    contact_id: int = static_field(default=0)

    def value(self, space, x, u):
        w = u[..., 6 * self.contact_id : 6 * self.contact_id + 6]
        f, tau = w[..., :3], w[..., 3:]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        tx, ty = tau[..., 0], tau[..., 1]
        X, Y = self.half_length_x, self.half_length_y
        return jnp.stack(
            [
                -fz,
                fx - self.mu * fz,
                -fx - self.mu * fz,
                fy - self.mu * fz,
                -fy - self.mu * fz,
                ty - X * fz,
                -ty - X * fz,
                tx - Y * fz,
                -tx - Y * fz,
            ],
            axis=-1,
        )


@pytree_dataclass
class CentroidalWrapperResidual(StageFunction):
    """Adapt a centroidal residual to the force-in-state formulation used by
    ``ContinuousCentroidalFwdDynamics`` (reference
    ``centroidal-wrapper.hpp:10-29``): the extended state
    x = (c, h, L, forces) is split at ``x_dim`` and the force tail is fed to
    the inner residual as its control, so the same cone/acceleration
    residuals work whether forces are controls or states."""

    inner: StageFunction
    x_dim: int = static_field(default=9)

    def value(self, space, x, u):
        return self.inner.value(space, x[..., : self.x_dim], x[..., self.x_dim :])
