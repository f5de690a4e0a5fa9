"""Stage functions (residuals) with autodiff-default Jacobians.

Counterpart of ``StageFunctionTpl``/``UnaryFunctionTpl`` (reference
``include/aligator/core/function-abstract.hpp:12``,
``core/unary-function.hpp:12``). A stage function maps ``(x, u) → r`` with
``r ∈ R^nr``; Jacobians are taken in *tangent* coordinates of the state
manifold. Where the reference ships a finite-difference autodiff helper
(``modelling/autodiff/finite-difference.hpp``), here exact forward-mode
autodiff is the default and closed forms are optional overrides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, static_field
from .manifolds import Manifold


class StageFunction:
    """Residual r(x, u). Subclasses implement ``value``; ``jacobians`` has an
    exact autodiff default."""

    nr: int

    def value(self, space: Manifold, x, u):
        raise NotImplementedError

    def jacobians(self, space: Manifold, x, u):
        """Returns (Jx, Ju) in tangent coordinates: Jx (nr, ndx), Ju (nr, nu)."""
        dt = jnp.result_type(x)

        def f_dx(dx):
            return self.value(space, space.integrate(x, dx), u)

        def f_du(du):
            return self.value(space, x, u + du)

        Jx = jax.jacfwd(f_dx)(jnp.zeros((space.ndx,), dt))
        Ju = jax.jacfwd(f_du)(jnp.zeros_like(u))
        return Jx, Ju


@pytree_dataclass
class StateErrorResidual(StageFunction):
    """r(x) = x ⊖ target (reference ``modelling/state-error.hpp:21``)."""

    target: jax.Array

    def value(self, space, x, u):
        return space.difference(self.target, x)

    def jacobians(self, space, x, u):
        Jx = space.jdifference(self.target, x, 1)
        Ju = jnp.zeros((space.ndx, u.shape[-1]), jnp.result_type(x))
        return Jx, Ju


@pytree_dataclass
class ControlErrorResidual(StageFunction):
    """r(u) = u − target (reference ``modelling/state-error.hpp:69``)."""

    target: jax.Array

    def value(self, space, x, u):
        return u - self.target

    def jacobians(self, space, x, u):
        dt = jnp.result_type(u)
        nu = u.shape[-1]
        return jnp.zeros((nu, space.ndx), dt), jnp.eye(nu, dtype=dt)


@pytree_dataclass
class LinearFunction(StageFunction):
    """r(x, u) = A dx + B u + c, with dx the tangent coordinate of x around a
    reference point (reference ``modelling/linear-function.hpp``). For vector
    spaces this is the usual affine function of (x, u)."""

    A: jax.Array  # (nr, ndx)
    B: jax.Array  # (nr, nu)
    c: jax.Array  # (nr,)

    def value(self, space, x, u):
        # On a vector space tangent coords coincide with x.
        dx = space.difference(space.neutral().astype(x.dtype), x)
        return self.A @ dx + self.B @ u + self.c

    def jacobians(self, space, x, u):
        return self.A, self.B


@pytree_dataclass
class ControlBoxFunction(StageFunction):
    """r(u) = [u - umax; umin - u] ≤ 0 — helper residual for control bounds
    expressed with a NegativeOrthant set (reference
    ``modelling/control-box-function.hpp``). Prefer BoxConstraint +
    ControlErrorResidual in new code."""

    umin: jax.Array
    umax: jax.Array

    def value(self, space, x, u):
        return jnp.concatenate([u - self.umax, self.umin - u], -1)

    def jacobians(self, space, x, u):
        dt = jnp.result_type(u)
        nu = u.shape[-1]
        eye = jnp.eye(nu, dtype=dt)
        Ju = jnp.concatenate([eye, -eye], 0)
        Jx = jnp.zeros((2 * nu, space.ndx), dt)
        return Jx, Ju


@pytree_dataclass
class FunctionSlice(StageFunction):
    """Take selected rows of another function's residual (reference
    ``modelling/function-xpr-slice.hpp``)."""

    func: StageFunction
    indices: tuple = static_field(default=())

    def value(self, space, x, u):
        idx = jnp.asarray(self.indices)
        return self.func.value(space, x, u)[idx]

    def jacobians(self, space, x, u):
        idx = jnp.asarray(self.indices)
        Jx, Ju = self.func.jacobians(space, x, u)
        return Jx[idx], Ju[idx]


@pytree_dataclass
class GatedFunction(StageFunction):
    """r(x,u) = gate · f(x,u) with a (stage-varying) scalar gate leaf.

    The stacked-stage analog of attaching a constraint to *some* stages only
    (the reference builds type-heterogeneous stage lists, e.g.
    ``examples/continuous-centroidal.py:249-258`` pins extra equalities on the
    first/last stage): gate=0 zeroes the rows (trivially feasible/costless),
    gate=1 activates them, and the gate can differ per stage through the
    stacked pytree leaves."""

    func: StageFunction
    gate: jax.Array = 1.0

    def value(self, space, x, u):
        return jnp.asarray(self.gate) * self.func.value(space, x, u)

    def jacobians(self, space, x, u):
        Jx, Ju = self.func.jacobians(space, x, u)
        g = jnp.asarray(self.gate)
        return g * Jx, g * Ju


@pytree_dataclass
class LinearFunctionComposition(StageFunction):
    """r(x,u) = A f(x,u) + b (reference
    ``modelling/linear-function-composition.hpp:13``)."""

    func: StageFunction
    A: jax.Array
    b: jax.Array

    def value(self, space, x, u):
        return self.A @ self.func.value(space, x, u) + self.b

    def jacobians(self, space, x, u):
        Jx, Ju = self.func.jacobians(space, x, u)
        return self.A @ Jx, self.A @ Ju
