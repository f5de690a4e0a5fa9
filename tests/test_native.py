"""Cross-validate the JAX Riccati solver against the independent native C++
reference implementation (two codebases, same math — the strongest oracle
available without the reference library installed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import gar
from aligator_tpu.native import riccati_solve_native

MUDYN = 1e-3
MUEQ = 1e-4


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("dims", [(8, 4, 3, 2), (20, 6, 3, 0), (5, 3, 2, 1)])
def test_jax_vs_native(seed, dims):
    N, nx, nu, nc = dims
    prob = gar.random_problem(
        jax.random.PRNGKey(seed), N, nx, nu, nc, dtype=jnp.float64
    )
    xs_j, us_j, vs_j, lams_j = gar.solve(prob, MUDYN, MUEQ, assume_explicit=True)
    xs_n, us_n, vs_n, lams_n = riccati_solve_native(prob, MUDYN, MUEQ)

    assert np.allclose(np.asarray(xs_j), xs_n, atol=1e-9)
    assert np.allclose(np.asarray(us_j), us_n, atol=1e-9)
    assert np.allclose(np.asarray(vs_j), vs_n, atol=1e-9)
    assert np.allclose(np.asarray(lams_j), lams_n, atol=1e-9)

    # and the native solution satisfies the KKT oracle on its own
    errs = gar.kkt_error(
        prob, jnp.asarray(xs_n), jnp.asarray(us_n), jnp.asarray(vs_n),
        jnp.asarray(lams_n), MUDYN, MUEQ,
    )
    assert max(float(e) for e in errs) < 1e-9


def test_native_general_e():
    from aligator_tpu._pytree import replace

    prob = gar.random_problem(jax.random.PRNGKey(9), 10, 4, 2, 2, dtype=jnp.float64)
    E = prob.knots.E
    pert = 0.25 * jax.random.normal(jax.random.PRNGKey(4), E[:10].shape, dtype=E.dtype)
    prob = replace(prob, knots=replace(prob.knots, E=E.at[:10].add(pert)))
    xs_j, us_j, _, lams_j = gar.solve(prob, MUDYN, MUEQ)
    xs_n, us_n, _, lams_n = riccati_solve_native(prob, MUDYN, MUEQ)
    assert np.allclose(np.asarray(xs_j), xs_n, atol=1e-9)
    assert np.allclose(np.asarray(lams_j), lams_n, atol=1e-9)
