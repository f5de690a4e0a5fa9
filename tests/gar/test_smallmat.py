"""Small-matrix kernel unit tests (gar/smallmat.py).

The blocked Cholesky / triangular solves / block inverses are the
performance core of every Riccati scan (reference counterpart: Eigen's
LLT/LDLT used throughout ``gar/riccati-kernel.hxx``); cross-validate them
against LAPACK-grade references at every size class.
"""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.gar import smallmat


def _spd(key, n, scale=1.0, dtype=jnp.float64):
    r = jax.random.normal(key, (n, n + 4), dtype)
    return (r @ r.T / n) * scale + 0.01 * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [2, 3, 4, 6, 12, 36, 56])
def test_solve_spd_matches_lapack(n):
    M = _spd(jax.random.PRNGKey(n), n)
    B = jax.random.normal(jax.random.PRNGKey(100 + n), (n, 5), jnp.float64)
    X = smallmat.solve_spd(M, B)
    X_ref = jnp.linalg.solve(M, B)
    assert jnp.allclose(X, X_ref, atol=1e-9)


@pytest.mark.parametrize("n", [2, 4, 6, 12, 36, 56])
@pytest.mark.parametrize("lam_max", [1.0, 1e3, 1e6])
def test_spd_block_inv_mu_schur_domain(n, lam_max):
    """The μ-Schur matrices I + μP (eigs in [1, 1+μλmax]) are the intended
    domain: the Newton-refined block inverse must reach near machine
    precision across the realistic λmax range."""
    P = _spd(jax.random.PRNGKey(7 * n), n, scale=lam_max)
    M = jnp.eye(n, dtype=jnp.float64) + 1e-3 * P
    X = smallmat.spd_block_inv(M)
    err = jnp.max(jnp.abs(X @ M - jnp.eye(n, dtype=jnp.float64)))
    assert float(err) < 1e-9
    # symmetric by construction
    assert jnp.allclose(X, X.T, atol=0.0)


def test_spd_block_inv_batched_vmap():
    Ms = jax.vmap(lambda k: jnp.eye(12) + 1e-2 * _spd(k, 12, 50.0))(
        jax.random.split(jax.random.PRNGKey(0), 8)
    )
    Xs = jax.vmap(smallmat.spd_block_inv)(Ms)
    resid = Xs @ Ms - jnp.eye(12, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(resid))) < 1e-9
