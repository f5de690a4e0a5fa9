"""Cost functions with autodiff/Gauss-Newton derivatives.

Counterpart of ``CostAbstractTpl`` (reference
``include/aligator/core/cost-abstract.hpp:13``) and the concrete costs in
``modelling/costs/``. Derivatives are taken in tangent coordinates; the
default is exact autodiff (gradient + full Hessian), while residual costs
override with Gauss-Newton (the reference default,
``solver-proxddp.hpp:163``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from .functions import StageFunction
from .manifolds import Manifold


def _tangent_wrap(cost_value, space, x, u):
    def f(dxu):
        dx, du = dxu[: space.ndx], dxu[space.ndx :]
        return cost_value(space.integrate(x, dx), u + du)

    return f


class Cost:
    """Scalar stage cost ℓ(x, u)."""

    def value(self, space: Manifold, x, u):
        raise NotImplementedError

    def gradients(self, space, x, u):
        dt = jnp.result_type(x)
        f = _tangent_wrap(lambda xx, uu: self.value(space, xx, uu), space, x, u)
        z = jnp.zeros((space.ndx + u.shape[-1],), dt)
        g = jax.grad(f)(z)
        return g[: space.ndx], g[space.ndx :]

    def hessians(self, space, x, u):
        """Returns (Lxx, Lxu, Luu)."""
        dt = jnp.result_type(x)
        f = _tangent_wrap(lambda xx, uu: self.value(space, xx, uu), space, x, u)
        z = jnp.zeros((space.ndx + u.shape[-1],), dt)
        H = jax.hessian(f)(z)
        nd = space.ndx
        return H[:nd, :nd], H[:nd, nd:], H[nd:, nd:]


@pytree_dataclass
class ConstantCost(Cost):
    """ℓ = c (reference ``modelling/costs/constant-cost.hpp:8``)."""

    c: jax.Array

    def value(self, space, x, u):
        return self.c

    def gradients(self, space, x, u):
        dt = jnp.result_type(x)
        return jnp.zeros((space.ndx,), dt), jnp.zeros_like(u)

    def hessians(self, space, x, u):
        dt = jnp.result_type(x)
        nd, nu = space.ndx, u.shape[-1]
        return (
            jnp.zeros((nd, nd), dt),
            jnp.zeros((nd, nu), dt),
            jnp.zeros((nu, nu), dt),
        )


@pytree_dataclass
class QuadraticCost(Cost):
    """ℓ = ½ dx'Q dx + dx'N u + ½ u'R u + q'dx + r'u + c with dx = x ⊖ 0
    (reference ``modelling/costs/quad-costs.hpp:13``; on vector spaces dx=x)."""

    Q: jax.Array
    R: jax.Array
    N: jax.Array  # (ndx, nu) cross term
    q: jax.Array
    r: jax.Array
    c: jax.Array

    @staticmethod
    def create(Q, R, N=None, q=None, r=None, c=0.0):
        dt = jnp.result_type(Q)
        nd, nu = Q.shape[-1], R.shape[-1]
        return QuadraticCost(
            Q=jnp.asarray(Q),
            R=jnp.asarray(R),
            N=jnp.zeros((nd, nu), dt) if N is None else jnp.asarray(N),
            q=jnp.zeros((nd,), dt) if q is None else jnp.asarray(q),
            r=jnp.zeros((nu,), dt) if r is None else jnp.asarray(r),
            c=jnp.asarray(c, dt),
        )

    def _dx(self, space, x):
        # cast: neutral() has no dtype context and would otherwise promote
        # fp32 problem data to fp64 when x64 is enabled
        return space.difference(space.neutral().astype(x.dtype), x)

    def value(self, space, x, u):
        dx = self._dx(space, x)
        return (
            0.5 * dx @ (self.Q @ dx)
            + dx @ (self.N @ u)
            + 0.5 * u @ (self.R @ u)
            + self.q @ dx
            + self.r @ u
            + self.c
        )

    def gradients(self, space, x, u):
        dx = self._dx(space, x)
        Lx = self.Q @ dx + self.N @ u + self.q
        Lu = self.N.T @ dx + self.R @ u + self.r
        return Lx, Lu

    def hessians(self, space, x, u):
        return self.Q, self.N, self.R


@pytree_dataclass
class QuadraticResidualCost(Cost):
    """ℓ = ½ ‖r(x,u)‖²_W with Gauss-Newton derivatives (reference
    ``modelling/costs/quad-residual-cost.hpp:18``).

    With ``gauss_newton=False`` the Hessian includes the residual-curvature
    term Σ_k (W r)_k ∇²r_k (reference
    ``quad-residual-cost.hxx:55-63`` + ``computeVectorHessianProducts``) —
    in JAX this is simply the exact autodiff Hessian of the value.
    """

    residual: StageFunction
    weights: jax.Array  # (nr, nr)
    gauss_newton: bool = static_field(default=True)

    def value(self, space, x, u):
        r = self.residual.value(space, x, u)
        return 0.5 * r @ (self.weights @ r)

    def gradients(self, space, x, u):
        r = self.residual.value(space, x, u)
        Jx, Ju = self.residual.jacobians(space, x, u)
        Wr = self.weights @ r
        return Jx.T @ Wr, Ju.T @ Wr

    def hessians(self, space, x, u):
        if not self.gauss_newton:
            # exact: autodiff Hessian of the value (= GN + residual VHP)
            return Cost.hessians(self, space, x, u)
        # Gauss-Newton: drop the residual-curvature term.
        Jx, Ju = self.residual.jacobians(space, x, u)
        WJx = self.weights @ Jx
        WJu = self.weights @ Ju
        return Jx.T @ WJx, Jx.T @ WJu, Ju.T @ WJu


def QuadraticStateCost(target, weights):
    """½‖x ⊖ target‖²_W (reference ``quad-state-cost.hpp:13``)."""
    from .functions import StateErrorResidual

    return QuadraticResidualCost(
        residual=StateErrorResidual(target=jnp.asarray(target)),
        weights=jnp.asarray(weights),
    )


def QuadraticControlCost(weights, target=None):
    """½‖u − target‖²_W (reference ``quad-state-cost.hpp:47``)."""
    from .functions import ControlErrorResidual

    weights = jnp.asarray(weights)
    nu = weights.shape[-1]
    if target is None:
        target = jnp.zeros((nu,), weights.dtype)
    return QuadraticResidualCost(
        residual=ControlErrorResidual(target=jnp.asarray(target)),
        weights=weights,
    )


@pytree_dataclass
class LogResidualCost(Cost):
    """Pseudo-Huber: ℓ = Σ w_i ln(1 + r_i²/s²) — smooth robust cost
    (reference ``modelling/costs/log-residual-cost.hpp:10``)."""

    residual: StageFunction
    weights: jax.Array  # (nr,)
    scale: jax.Array

    def value(self, space, x, u):
        r = self.residual.value(space, x, u)
        return jnp.sum(self.weights * jnp.log1p((r / self.scale) ** 2))


@pytree_dataclass
class RelaxedLogBarrierCost(Cost):
    """Relaxed log-barrier on a residual (reference
    ``modelling/costs/relaxed-log-barrier.hpp:11``): −w·log(r) for r > δ,
    quadratic extension below δ."""

    residual: StageFunction
    weights: jax.Array  # (nr,)
    threshold: jax.Array

    def value(self, space, x, u):
        r = self.residual.value(space, x, u)
        d = self.threshold
        quad = 0.5 * (((r - 2.0 * d) / d) ** 2 - 1.0) - jnp.log(d)
        safe_r = jnp.where(r > d, r, d)
        val = jnp.where(r > d, -jnp.log(safe_r), quad)
        return jnp.sum(self.weights * val)


@pytree_dataclass
class CostStack(Cost):
    """Weighted sum of costs (reference
    ``modelling/costs/sum-of-costs.hpp:19``)."""

    costs: tuple = ()
    weights: tuple = ()

    @staticmethod
    def create(*costs, weights=None):
        if weights is None:
            weights = (1.0,) * len(costs)
        return CostStack(costs=tuple(costs), weights=tuple(weights))

    def value(self, space, x, u):
        total = 0.0
        for w, c in zip(self.weights, self.costs):
            total = total + w * c.value(space, x, u)
        return total

    def gradients(self, space, x, u):
        Lx, Lu = 0.0, 0.0
        for w, c in zip(self.weights, self.costs):
            gx, gu = c.gradients(space, x, u)
            Lx = Lx + w * gx
            Lu = Lu + w * gu
        return Lx, Lu

    def hessians(self, space, x, u):
        Lxx, Lxu, Luu = 0.0, 0.0, 0.0
        for w, c in zip(self.weights, self.costs):
            hxx, hxu, huu = c.hessians(space, x, u)
            Lxx = Lxx + w * hxx
            Lxu = Lxu + w * hxu
            Luu = Luu + w * huu
        return Lxx, Lxu, Luu


@pytree_dataclass
class DirectSumCost(Cost):
    """Cost on a product space acting on component slices (reference
    ``modelling/costs/cost-direct-sum.hpp:10``): evaluates ``cost`` on the
    sub-state slice [x_start:x_end) and control slice [u_start:u_end)."""

    cost: Cost
    sub_space: Manifold = static_field(default=None)
    x_slice: tuple = static_field(default=())
    u_slice: tuple = static_field(default=())

    def value(self, space, x, u):
        xs = x[self.x_slice[0] : self.x_slice[1]]
        us = u[self.u_slice[0] : self.u_slice[1]]
        return self.cost.value(self.sub_space, xs, us)
