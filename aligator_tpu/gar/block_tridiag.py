"""Symmetric block-tridiagonal solve via scan.

Counterpart of the reference's block-tridiagonal routines
(``include/aligator/gar/block-tridiagonal.hpp:52-242``). The condensed
interface system of the parallel-in-time Riccati solver is symmetric
block-tridiagonal with uniform block size; here it is factorized by a
downward block-elimination (UDUᵀ-like) expressed as `lax.scan`s.

Blocks are stacked arrays: diag (K, n, n), lower (K-1, n, n) (sub-diagonal),
rhs (K, n). The matrix is [[D0, L0ᵀ, ...], [L0, D1, L1ᵀ, ...], ...].

The diagonal blocks of the condensed system are indefinite (saddle point), so
plain LU solves (``jnp.linalg.solve``) are used per block — sizes are tiny
(nx ≤ a few dozen), and the whole factorization is sequential in K but K is
only 2·legs.

The factorization is exposed separately (:func:`factorize` +
:func:`solve_factored`) so that (a) iterative refinement re-solves on the
residual without re-eliminating (reference ``blockTridiagRefinementStep``,
``block-tridiagonal.hpp:145``) and (b) the parallel Riccati solver can fold
θ-feedback into first-stage state feedback (``collapseFeedback``,
``parallel-solver.hpp:55-66``) using the recorded ``W`` factors, which encode
``∂x_{k+1}/∂x_k = -W_k`` along the elimination chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from .._precision import highest_precision
from jax import lax


def factorize(diag, lower):
    """Downward block elimination (from block K-1 to 0).

    Schur complements: ``D̃_{K-1} = D_{K-1}``;
    ``D̃_k = D_k - L_kᵀ D̃_{k+1}^{-1} L_k``. Returns ``(Dt0, Dts, Ws)`` where
    ``Dts[k] = D̃_{k+1}`` and ``Ws[k] = D̃_{k+1}^{-1} L_k`` for k = 0..K-2.
    In the forward substitution ``x_{k+1} = D̃_{k+1}^{-1} b̃_{k+1} - W_k x_k``,
    so ``-W_k`` is the exact total sensitivity ``∂x_{k+1}/∂x_k``.
    """

    def elim(Dt_next, inp):
        D_k, L_k = inp
        W = jnp.linalg.solve(Dt_next, L_k)
        Dt = D_k - L_k.T @ W
        return Dt, (Dt_next, W)

    K = diag.shape[0]
    Dt0, (Dts, Ws) = lax.scan(
        elim, diag[K - 1], (diag[: K - 1], lower), reverse=True
    )
    return Dt0, Dts, Ws


@highest_precision
def solve_factored(factors, lower, rhs):
    """Solve with a precomputed :func:`factorize` result. Returns x (K, n)."""
    Dt0, Dts, Ws = factors

    # rhs elimination: b̃_{K-1} = b_{K-1}; b̃_k = b_k - W_kᵀ b̃_{k+1}
    # (D̃ symmetric ⇒ L_kᵀ D̃_{k+1}^{-1} = W_kᵀ).
    def rhs_elim(bt_next, inp):
        b_k, W_k = inp
        bt = b_k - W_k.T @ bt_next
        return bt, bt_next

    K = rhs.shape[0]
    bt0, bts = lax.scan(rhs_elim, rhs[K - 1], (rhs[: K - 1], Ws), reverse=True)

    x0 = jnp.linalg.solve(Dt0, bt0)

    def fwd(x_k, inp):
        Dt_next, W_k, bt_next = inp
        x_next = jnp.linalg.solve(Dt_next, bt_next) - W_k @ x_k
        return x_next, x_next

    _, xs_rest = lax.scan(fwd, x0, (Dts, Ws, bts))
    return jnp.concatenate([x0[None], xs_rest], axis=0)


@highest_precision
def solve(diag, lower, rhs, refine_steps: int = 0):
    """Solve the symmetric block-tridiagonal system. Returns x (K, n).

    ``refine_steps`` iterative-refinement passes reuse the factorization
    (reference runs ≤5 such steps on the condensed system,
    ``parallel-solver.hxx:148-175``).
    """
    factors = factorize(diag, lower)
    x = solve_factored(factors, lower, rhs)
    for _ in range(refine_steps):
        resid = rhs - matmul(diag, lower, x)
        x = x + solve_factored(factors, lower, resid)
    return x


def matmul(diag, lower, x):
    """y = T x for the symmetric block-tridiagonal T (for refinement checks)."""
    y = jnp.einsum("kij,kj->ki", diag, x)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", lower, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", lower, x[1:]))
    return y
