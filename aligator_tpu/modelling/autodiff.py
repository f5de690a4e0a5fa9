"""Finite-difference derivative helpers.

Counterpart of the reference's autodiff component
(``modelling/autodiff/finite-difference.hpp:15``,
``cost-finite-difference.hpp``). In JAX the production path is exact
autodiff; these FD versions exist for test parity — the reference's pytest
suite checks every residual/cost against finite differences, and these
helpers let the same checks run here against the autodiff Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp


def fd_stage_function_jacobians(func, space, x, u, eps=1e-6):
    """Central finite-difference (Jx, Ju) of a StageFunction on the manifold."""
    ndx = space.ndx
    nu = u.shape[-1]
    r0 = func.value(space, x, u)
    Jx_cols, Ju_cols = [], []
    for i in range(ndx):
        dv = jnp.zeros((ndx,), x.dtype).at[i].set(eps)
        rp = func.value(space, space.integrate(x, dv), u)
        rm = func.value(space, space.integrate(x, -dv), u)
        Jx_cols.append((rp - rm) / (2 * eps))
    for i in range(nu):
        du = jnp.zeros((nu,), u.dtype).at[i].set(eps)
        rp = func.value(space, x, u + du)
        rm = func.value(space, x, u - du)
        Ju_cols.append((rp - rm) / (2 * eps))
    Jx = jnp.stack(Jx_cols, axis=-1) if Jx_cols else jnp.zeros((r0.shape[0], 0))
    Ju = jnp.stack(Ju_cols, axis=-1) if Ju_cols else jnp.zeros((r0.shape[0], 0))
    return Jx, Ju


def fd_cost_gradients(cost, space, x, u, eps=1e-6):
    """Central finite-difference (Lx, Lu) of a Cost on the manifold."""
    ndx = space.ndx
    nu = u.shape[-1]
    gx, gu = [], []
    for i in range(ndx):
        dv = jnp.zeros((ndx,), x.dtype).at[i].set(eps)
        cp = cost.value(space, space.integrate(x, dv), u)
        cm = cost.value(space, space.integrate(x, -dv), u)
        gx.append((cp - cm) / (2 * eps))
    for i in range(nu):
        du = jnp.zeros((nu,), u.dtype).at[i].set(eps)
        cp = cost.value(space, x, u + du)
        cm = cost.value(space, x, u - du)
        gu.append((cp - cm) / (2 * eps))
    return jnp.stack(gx), jnp.stack(gu)


def fd_dynamics_jacobians(dyn, space, x, u, eps=1e-6):
    """Central finite-difference (A, B, E) of an ExplicitDynamics residual."""
    y = dyn.forward(space, x, u)
    ndx, nu = space.ndx, u.shape[-1]
    A, B, E = [], [], []
    for i in range(ndx):
        dv = jnp.zeros((ndx,), x.dtype).at[i].set(eps)
        rp = dyn.residual(space, space.integrate(x, dv), u, y)
        rm = dyn.residual(space, space.integrate(x, -dv), u, y)
        A.append((rp - rm) / (2 * eps))
        rp = dyn.residual(space, x, u, space.integrate(y, dv))
        rm = dyn.residual(space, x, u, space.integrate(y, -dv))
        E.append((rp - rm) / (2 * eps))
    for i in range(nu):
        du = jnp.zeros((nu,), u.dtype).at[i].set(eps)
        rp = dyn.residual(space, x, u + du, y)
        rm = dyn.residual(space, x, u - du, y)
        B.append((rp - rm) / (2 * eps))
    return (
        jnp.stack(A, axis=-1),
        jnp.stack(B, axis=-1) if B else jnp.zeros((ndx, 0)),
        jnp.stack(E, axis=-1),
    )
