"""Constraint sets / nonsmooth penalties.

Counterpart of ``ConstraintSetTpl`` (reference
``include/aligator/core/constraint-set.hpp:16``) and the concrete sets in
``modelling/constraints/``. Sets are pytree dataclasses (Box carries bound
arrays); operations are elementwise and vectorize trivially on the VPU.

The ALM machinery needs three ops per set:
  ``projection(z)``             — projection onto the set
  ``normal_cone_projection(z)`` — z minus projection (the shifted-constraint
                                  image used for multiplier estimates)
  ``active_mask(z)``            — rows where the normal-cone projection
                                  Jacobian is nonzero (diagonal 0/1 for all
                                  sets here), used to mask constraint
                                  Jacobian rows in the LQ subproblem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field


class ConstraintSet:
    """Base class; defaults express a generic projection operator."""

    def evaluate(self, zproj) -> jax.Array:
        """Nonsmooth penalty value at the projected point (0 for indicators)."""
        return jnp.asarray(0.0, jnp.result_type(zproj))

    def projection(self, z) -> jax.Array:
        raise NotImplementedError

    def normal_cone_projection(self, z) -> jax.Array:
        return z - self.projection(z)

    def active_mask(self, z) -> jax.Array:
        raise NotImplementedError

    def set_prox_parameter(self, mu) -> "ConstraintSet":
        """Return a copy parameterized by the prox scale μ (L1-type penalties)."""
        return self

    def moreau_envelope(self, z, mu) -> jax.Array:
        """Moreau envelope value of the penalty at z with prox scale μ
        (reference ``evaluateMoreauEnvelope``, core/constraint-set.hpp:93):
        penalty at the prox point plus the quadratic prox distance. For
        indicator sets this is ``dist²(z, set)/(2μ)``."""
        s = self.set_prox_parameter(mu)
        zprox = s.projection(z)
        zres = z - zprox
        return s.evaluate(zprox) + 0.5 / mu * jnp.sum(zres * zres)


@pytree_dataclass
class EqualityConstraint(ConstraintSet):
    """{0} singleton (reference ``equality-constraint.hpp:17``)."""

    def projection(self, z):
        return jnp.zeros_like(z)

    def normal_cone_projection(self, z):
        return z

    def active_mask(self, z):
        return jnp.ones(z.shape, bool)


@pytree_dataclass
class NegativeOrthant(ConstraintSet):
    """h(x,u) ≤ 0 (reference ``negative-orthant.hpp:19``)."""

    def projection(self, z):
        return jnp.minimum(z, 0.0)

    def normal_cone_projection(self, z):
        return jnp.maximum(z, 0.0)

    def active_mask(self, z):
        return z > 0.0


@pytree_dataclass
class BoxConstraint(ConstraintSet):
    """lb ≤ z ≤ ub (reference ``box-constraint.hpp:10``)."""

    lower: jax.Array
    upper: jax.Array

    def projection(self, z):
        return jnp.clip(z, self.lower, self.upper)

    def active_mask(self, z):
        return jnp.logical_or(z < self.lower, z > self.upper)


@pytree_dataclass
class L1Penalty(ConstraintSet):
    """Nonsmooth penalty λ‖z‖₁ via its prox (reference ``l1-penalty.hpp:18``).

    The prox with scale μ is soft-thresholding; the "normal cone projection"
    is the residual z − prox(z) = clip(z, −λμ, λμ).
    """

    scale: jax.Array = 1.0
    mu: jax.Array = 0.01

    def evaluate(self, zproj):
        return self.scale * jnp.sum(jnp.abs(zproj))

    def projection(self, z):
        thresh = self.scale * self.mu
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - thresh, 0.0)

    def active_mask(self, z):
        return jnp.abs(z) > self.scale * self.mu

    def set_prox_parameter(self, mu):
        from .._pytree import replace

        return replace(self, mu=mu)


@pytree_dataclass
class ConstraintSetProduct(ConstraintSet):
    """Cartesian product of sets over slices of the stacked residual vector
    (reference ``constraint-set-product.hpp:38``)."""

    sets: tuple = ()
    dims: tuple = static_field(default=())

    def _map(self, z, op):
        if not self.sets:
            return z
        outs, i = [], 0
        for s, n in zip(self.sets, self.dims):
            outs.append(op(s, z[..., i : i + n]))
            i += n
        return jnp.concatenate(outs, axis=-1)

    def projection(self, z):
        return self._map(z, lambda s, zz: s.projection(zz))

    def normal_cone_projection(self, z):
        return self._map(z, lambda s, zz: s.normal_cone_projection(zz))

    def active_mask(self, z):
        if not self.sets:
            return jnp.zeros(z.shape, bool)
        return self._map(z, lambda s, zz: s.active_mask(zz))

    def evaluate(self, zproj):
        val, i = 0.0, 0
        for s, n in zip(self.sets, self.dims):
            val = val + s.evaluate(zproj[..., i : i + n])
            i += n
        return val

    def set_prox_parameter(self, mu):
        from .._pytree import replace

        return replace(self, sets=tuple(s.set_prox_parameter(mu) for s in self.sets))
