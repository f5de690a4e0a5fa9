"""Discrete dynamics interface.

Counterpart of ``DynamicsModelTpl`` / ``ExplicitDynamicsModelTpl`` (reference
``include/aligator/core/dynamics.hpp:14``, ``core/explicit-dynamics.hpp:20``).

An explicit dynamics is a pure map ``xnext = forward(x, u)`` between points of
the state manifold. Following the reference's residual convention
(``core/explicit-dynamics.hxx:21``), the implicit residual used by the
solvers is

    value(x, u, y) = y ⊖ forward(x, u)... (reference: difference(y, xnext))

with tangent-space Jacobians ``A = ∂value/∂x``, ``B = ∂value/∂u``,
``E = ∂value/∂y`` (``E = −I`` on vector spaces). Autodiff defaults; override
``jacobians`` for closed forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass
from .manifolds import Manifold


class ExplicitDynamics:
    """Explicit discrete dynamics x_{t+1} = forward(x_t, u_t)."""

    def forward(self, space: Manifold, x, u):
        raise NotImplementedError

    def residual(self, space, x, u, y):
        """Implicit residual value(x,u,y) = difference(y, forward(x,u))."""
        return space.difference(y, self.forward(space, x, u))

    def jacobians(self, space, x, u, y):
        """Tangent-space Jacobians (A, B, E) of the residual."""
        dt = jnp.result_type(x)
        zx = jnp.zeros((space.ndx,), dt)

        def f_dx(dx):
            return self.residual(space, space.integrate(x, dx), u, y)

        def f_du(du):
            return self.residual(space, x, u + du, y)

        def f_dy(dy):
            return self.residual(space, x, u, space.integrate(y, dy))

        A = jax.jacfwd(f_dx)(zx)
        B = jax.jacfwd(f_du)(jnp.zeros_like(u))
        E = jax.jacfwd(f_dy)(zx)
        return A, B, E

    @property
    def is_explicit(self) -> bool:
        return True


@pytree_dataclass
class LinearDiscreteDynamics(ExplicitDynamics):
    """x' = A x + B u + c on a vector space (reference
    ``modelling/linear-discrete-dynamics.hpp``)."""

    A: jax.Array
    B: jax.Array
    c: jax.Array

    def forward(self, space, x, u):
        return self.A @ x + self.B @ u + self.c

    def jacobians(self, space, x, u, y):
        dt = jnp.result_type(x)
        E = -jnp.eye(self.A.shape[-1], dtype=dt)
        return self.A, self.B, E


class ImplicitDynamics(ExplicitDynamics):
    """Implicit discrete dynamics r(x, u, y) = 0 (reference
    ``DynamicsModelTpl``, ``core/dynamics.hpp:14``).

    Subclasses implement ``residual``; ``forward`` solves the residual with a
    fixed-iteration Newton method on the manifold (reference
    ``utils/forward-dyn.hpp:18-57`` / ``utils/newton-raphson.hpp:11``),
    jit-compatible (no data-dependent control flow).
    """

    newton_iters: int = 5

    def residual(self, space, x, u, y):
        raise NotImplementedError

    @property
    def is_explicit(self) -> bool:
        return False

    def forward_with_gap(self, space, x, u, gap=None, iters=None):
        """Solve r(x, u, y) + gap = 0 for y by Newton iterations seeded at x."""
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
