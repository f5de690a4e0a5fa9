"""Pallas fused Riccati kernel vs the XLA solver (interpreter mode on CPU;
see the module docstring for the Mosaic status note)."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar
from aligator_tpu.gar import pallas_riccati


@pytest.mark.parametrize("dims", [(10, 3, 2, 1), (15, 4, 2, 0)])
def test_pallas_matches_xla_interpret(dims):
    N, nx, nu, nc = dims
    B = 128
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=jnp.float64)
    )(jax.random.split(jax.random.PRNGKey(0), B))
    xs_r, us_r, vs_r, lams_r = jax.vmap(
        lambda p: gar.solve(p, 1e-3, 1e-3, assume_explicit=True)
    )(probs)
    xs_p, us_p, vs_p, lams_p = pallas_riccati.solve(
        probs, 1e-3, 1e-3, interpret=True
    )
    assert jnp.allclose(xs_p, xs_r, atol=1e-9)
    assert jnp.allclose(us_p, us_r, atol=1e-9)
    assert jnp.allclose(lams_p, lams_r, atol=1e-8)


def test_pallas_availability_gate():
    prob = gar.random_problem(jax.random.PRNGKey(0), 5, 3, 2, 0)
    assert pallas_riccati.available(prob, assume_explicit=True)
    assert not pallas_riccati.available(prob, assume_explicit=False)
