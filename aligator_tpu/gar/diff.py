"""Differentiable LQ solves (implicit function theorem).

A capability beyond the reference: reverse-mode gradients THROUGH the
proximal LQ solve, for learning-based MPC / differentiable-optimization
layers. The solution z = (xs, us, vs, λs) satisfies the symmetric KKT system
``M(θ) z + c(θ) = 0``; for a loss L(z) with cotangent z̄,

    w  = M⁻¹ z̄                      (ONE adjoint solve — M is symmetric,
                                     so it's the same Riccati solve with the
                                     rhs vectors replaced by cotangents)
    ∂L/∂c      = −w                 (rhs vectors q, r, d, f, g0)
    ∂L/∂M_blk  = −sym(w ⊗ z)        (matrix blocks Q,S,R,A,B,E,C,D,G0 via
                                     the outer products of the primal and
                                     adjoint solutions at their block
                                     positions)

Exposed as :func:`solve` with a ``jax.custom_vjp`` — drop-in for
``gar.solve`` when gradients w.r.t. problem data are needed. μ parameters
are non-differentiable here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .._pytree import replace
from . import riccati
from .lqr_problem import LQRProblem


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def solve(problem: LQRProblem, mudyn: float, mueq: float,
          assume_explicit: bool = False):
    """Differentiable version of ``gar.solve`` (μ's are static floats)."""
    return riccati.solve(problem, mudyn, mueq, assume_explicit)


def _fwd(problem, mudyn, mueq, assume_explicit):
    sol = riccati.solve(problem, mudyn, mueq, assume_explicit)
    return sol, (problem, sol)


def _bwd(mudyn, mueq, assume_explicit, res, cotangents):
    problem, sol = res
    xs, us, vs, lams = sol
    xb, ub, vb, lb = cotangents
    kn = problem.knots
    N = problem.horizon

    # adjoint problem: same matrices, rhs ← −cotangents ⇒ M w = z̄
    adj_kn = replace(
        kn,
        q=-xb,
        r=-ub,
        d=-vb,
        f=jnp.concatenate([-lb[1:], jnp.zeros_like(lb[:1])], axis=0),
    )
    adj_prob = replace(problem, knots=adj_kn, g0=-lb[0])
    wx, wu, wv, wl = riccati.solve(adj_prob, mudyn, mueq, assume_explicit)

    def outer(a, b):
        return jnp.einsum("ti,tj->tij", a, b)

    # rhs-vector gradients
    gq = -wx
    gr = -wu
    gd = -wv
    gf = jnp.zeros_like(kn.f).at[:N].set(-wl[1:])
    gg0 = -wl[0]

    # matrix-block gradients: −(w_row ⊗ z_col + z_row ⊗ w_col) per occurrence.
    # Q and R are used symmetrized by the solver (P and the reduced KKT are
    # explicitly symmetrized), so their gradients are the symmetric parts.
    gQ = -0.5 * (outer(wx, xs) + outer(xs, wx))
    gS = -(outer(wx, us) + outer(xs, wu))
    gR = -0.5 * (outer(wu, us) + outer(us, wu))
    zpad = jnp.zeros_like(kn.A[:1])

    gA = jnp.concatenate(
        [-(jnp.einsum("ti,tj->tij", wl[1:], xs[:N])
           + jnp.einsum("ti,tj->tij", lams[1:], wx[:N])), zpad], axis=0
    )
    gB = jnp.concatenate(
        [-(jnp.einsum("ti,tj->tij", wl[1:], us[:N])
           + jnp.einsum("ti,tj->tij", lams[1:], wu[:N])),
         jnp.zeros_like(kn.B[:1])], axis=0
    )
    gE = jnp.concatenate(
        [-(jnp.einsum("ti,tj->tij", wl[1:], xs[1:])
           + jnp.einsum("ti,tj->tij", lams[1:], wx[1:])), zpad], axis=0
    )
    gC = -(jnp.einsum("ti,tj->tij", wv, xs) + jnp.einsum("ti,tj->tij", vs, wx))
    gD = -(jnp.einsum("ti,tj->tij", wv, us) + jnp.einsum("ti,tj->tij", vs, wu))
    gG0 = -(jnp.einsum("i,j->ij", wl[0], xs[0]) + jnp.einsum("i,j->ij", lams[0], wx[0]))

    grads = replace(
        kn, Q=gQ, S=gS, R=gR, q=gq, r=gr, A=gA, B=gB, E=gE, f=gf,
        C=gC, D=gD, d=gd,
    )
    if kn.nth > 0:
        grads = replace(
            grads,
            Gx=jnp.zeros_like(kn.Gx),
            Gu=jnp.zeros_like(kn.Gu),
            Gth=jnp.zeros_like(kn.Gth),
            gamma=jnp.zeros_like(kn.gamma),
        )
    return (LQRProblem(knots=grads, G0=gG0, g0=gg0),)


solve.defvjp(_fwd, _bwd)
