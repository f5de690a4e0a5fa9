"""Symmetric block-tridiagonal solve via scan.

Counterpart of the reference's block-tridiagonal routines
(``include/aligator/gar/block-tridiagonal.hpp:52-242``). The condensed
interface system of the parallel-in-time Riccati solver is symmetric
block-tridiagonal with uniform block size; here it is factorized by a
downward block-elimination (UDUᵀ-like) expressed as two `lax.scan`s.

Blocks are stacked arrays: diag (K, n, n), lower (K-1, n, n) (sub-diagonal),
rhs (K, n). The matrix is [[D0, L0ᵀ, ...], [L0, D1, L1ᵀ, ...], ...].

The diagonal blocks of the condensed system are indefinite (saddle point), so
plain LU solves (``jnp.linalg.solve``) are used per block — sizes are tiny
(nx ≤ a few dozen), and the whole factorization is sequential in K but K is
only 2·legs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def solve(diag, lower, rhs):
    """Solve the symmetric block-tridiagonal system. Returns x (K, n).

    Backward elimination from the last block (matching the reference's
    ``symmetricBlockTridiagSolve`` which eliminates upward), then forward
    substitution.
    """
    K = diag.shape[0]

    # Downward elimination from block K-1 to 1:
    #   Schur: D̃_{k-1} = D_{k-1} - L_{k-1}ᵀ D̃_k^{-1} L_{k-1}
    #   rhs:   b̃_{k-1} = b_{k-1} - L_{k-1}ᵀ D̃_k^{-1} b̃_k
    def elim(carry, inp):
        Dt_next, bt_next = carry
        D_k, L_k, b_k = inp  # k from K-2 down to 0; L_k couples k and k+1
        X = jnp.linalg.solve(Dt_next, jnp.concatenate([L_k, bt_next[:, None]], axis=1))
        W = X[:, :-1]  # D̃_{k+1}^{-1} L_k
        y = X[:, -1]  # D̃_{k+1}^{-1} b̃_{k+1}
        Dt = D_k - L_k.T @ W
        bt = b_k - L_k.T @ y
        return (Dt, bt), (Dt_next, W, y)

    (Dt0, bt0), (Dts, Ws, ys) = lax.scan(
        elim, (diag[K - 1], rhs[K - 1]), (diag[: K - 1], lower, rhs[: K - 1]),
        reverse=True,
    )

    # Forward substitution: x_0 = D̃_0^{-1} b̃_0; x_{k+1} = D̃_{k+1}^{-1}(b̃_{k+1} - L_k x_k)
    x0 = jnp.linalg.solve(Dt0, bt0)

    def fwd(x_k, inp):
        Dt_next, L_k, bt_next = inp
        x_next = jnp.linalg.solve(Dt_next, bt_next - L_k @ x_k)
        return x_next, x_next

    # b̃_{k+1} values: for k+1 < K-1 they were modified during elimination; we
    # recorded D̃_{k+1} in Dts; recompute b̃ values by re-running elimination
    # bookkeeping: ys[k] = D̃_{k+1}^{-1} b̃_{k+1} → b̃_{k+1} = D̃_{k+1} ys[k].
    bts = jnp.einsum("kij,kj->ki", Dts, ys)
    _, xs_rest = lax.scan(fwd, x0, (Dts, lower, bts))
    return jnp.concatenate([x0[None], xs_rest], axis=0)


def matmul(diag, lower, x):
    """y = T x for the symmetric block-tridiagonal T (for refinement checks)."""
    y = jnp.einsum("kij,kj->ki", diag, x)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", lower, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", lower, x[1:]))
    return y
