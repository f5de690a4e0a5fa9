"""Centroidal dynamics.

Counterpart of ``CentroidalFwdDynamicsTpl`` (reference
``modelling/dynamics/centroidal-fwd.hpp:24``) and its continuous variant:
state x = (c, h, L) ∈ R⁹ (CoM position, linear momentum, angular momentum),
control u = stacked 3D contact forces at known contact points:

  ċ = h / m
  ḣ = m·g + Σᵢ fᵢ
  L̇ = Σᵢ (pᵢ − c) × fᵢ

The contact map (active flags + world points) is a pytree of arrays so
contact schedules can vary per stage (stacked leaves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from .ode import ODE


@pytree_dataclass
class ContactMap:
    """Counterpart of ``ContactMapTpl`` (reference
    ``modelling/contact-map.hpp:8``)."""

    points: jax.Array  # (n_contacts, 3) world positions
    active: jax.Array  # (n_contacts,) 0/1 flags

    @property
    def n_contacts(self) -> int:
        return self.points.shape[-2]


def _momentum_rates(contact_map, mass, gravity, c, forces):
    """Newton-Euler momentum rates from per-contact forces/wrenches.

    ``forces`` is (n_contacts, force_size) with force_size ∈ {3, 6}; the
    optional trailing 3 entries are contact torques added directly to L̇
    (reference ``centroidal-fwd.hxx:31-47``)."""
    act = contact_map.active[..., None]
    f3 = forces[..., :3]
    f_tot = jnp.sum(act * f3, axis=-2)
    tau = jnp.sum(
        act * jnp.cross(contact_map.points - c[..., None, :], f3), axis=-2
    )
    if forces.shape[-1] == 6:
        tau = tau + jnp.sum(act * forces[..., 3:6], axis=-2)
    hdot = mass * gravity + f_tot
    return hdot, tau


@pytree_dataclass
class CentroidalFwdDynamics(ODE):
    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array  # (3,)
    force_size: int = static_field(default=3)

    def xdot(self, space, x, u):
        c, h = x[..., 0:3], x[..., 3:6]
        forces = u.reshape((-1, self.force_size))
        hdot, Ldot = _momentum_rates(
            self.contact_map, self.mass, self.gravity, c, forces
        )
        cdot = h / self.mass
        return jnp.concatenate([cdot, hdot, Ldot], axis=-1)


@pytree_dataclass
class ContinuousCentroidalFwdDynamics(ODE):
    """Centroidal dynamics with the contact forces lifted into the state and
    the control re-interpreted as force *rates* (reference
    ``modelling/dynamics/continuous-centroidal-fwd.hpp:25``,
    ``continuous-centroidal-fwd.hxx:27-62``):

      x = (c, h, L, f₁ … f_nk) ∈ R^{9 + nk·fs},  u = ḟ (stacked rates)
      ċ = h/m,  ḣ = m·g + Σᵢ fᵢ,  L̇ = Σᵢ (pᵢ − c) × fᵢ [+ τᵢ],  ḟ = u

    Smooths force trajectories (rate penalties become plain control costs)
    and lets force bounds/cones act on state slices."""

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array  # (3,)
    force_size: int = static_field(default=3)

    def xdot(self, space, x, u):
        c, h = x[..., 0:3], x[..., 3:6]
        forces = x[..., 9:].reshape((-1, self.force_size))
        hdot, Ldot = _momentum_rates(
            self.contact_map, self.mass, self.gravity, c, forces
        )
        cdot = h / self.mass
        return jnp.concatenate([cdot, hdot, Ldot, u], axis=-1)


@pytree_dataclass
class KinodynamicsFwdDynamics(ODE):
    """Counterpart of ``KinodynamicsFwdDynamicsTpl`` (reference
    ``modelling/dynamics/kinodynamics-fwd.hpp:32``): centroidal state
    (c, h, L) coupled with joint configuration q_j driven by *commanded*
    joint accelerations; u = (contact forces, joint accelerations).

    State x = (c, h, L, q_j, v_j) on R⁹ × R^{nj} × R^{nj}.
    """

    contact_map: ContactMap
    mass: jax.Array
    gravity: jax.Array
    n_joints: int = static_field(default=0)

    def xdot(self, space, x, u):
        nj = self.n_joints
        nf = 3 * self.contact_map.n_contacts
        c, h = x[..., 0:3], x[..., 3:6]
        vj = x[..., 9 + nj : 9 + 2 * nj]
        forces = u[..., :nf].reshape((-1, 3))
        aj = u[..., nf:]
        act = self.contact_map.active[..., None]
        f_tot = jnp.sum(act * forces, axis=-2)
        tau = jnp.sum(
            act * jnp.cross(self.contact_map.points - c[..., None, :], forces),
            axis=-2,
        )
        cdot = h / self.mass
        hdot = self.mass * self.gravity + f_tot
        Ldot = tau
        return jnp.concatenate([cdot, hdot, Ldot, vj, aj], axis=-1)


@pytree_dataclass
class WheeledInvertedPendulumDynamics(ODE):
    """Counterpart of ``modelling/dynamics/wheeled-inverted-pendulum.hpp:8``:
    planar segway model. State (x, θ, ẋ, θ̇); control = wheel torque."""

    mass_cart: jax.Array
    mass_pole: jax.Array
    length: jax.Array
    wheel_radius: jax.Array
    gravity: jax.Array

    def xdot(self, space, x, u):
        th, xd, thd = x[..., 1], x[..., 2], x[..., 3]
        f = u[..., 0] / self.wheel_radius
        s, c = jnp.sin(th), jnp.cos(th)
        mt = self.mass_cart + self.mass_pole
        mp, l, g = self.mass_pole, self.length, self.gravity
        denom = mt - mp * c * c
        # inverted pendulum (θ = 0 upright, gravity destabilizing)
        xdd = (f + mp * s * (l * thd**2 - g * c)) / denom
        thdd = (-f * c - mp * l * thd**2 * c * s + mt * g * s) / (l * denom)
        return jnp.stack([xd, thd, xdd, thdd], axis=-1)
