"""Pallas fused Riccati kernel vs the XLA solver (interpreter mode on CPU;
the Mosaic-compiled path is validated on TPU hardware by the bench's
``frac_converged`` audit and the probes recorded in the module docstring)."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar
from aligator_tpu._pytree import replace
from aligator_tpu.gar import pallas_riccati, riccati


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


def test_pallas_general_E_interpret():
    """General dynamics E-blocks (manifold difference-chart Jacobians) via
    the kernel's unrolled Gauss-Jordan path."""
    N, nx, nu, nc = (8, 4, 2, 2)
    B = 128
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=jnp.float64)
    )(jax.random.split(jax.random.PRNGKey(0), B))
    dE = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), probs.knots.E.shape, jnp.float64
    )
    probs = replace(probs, knots=replace(probs.knots, E=probs.knots.E + dE))
    ref = jax.vmap(lambda p: gar.solve(p, 1e-3, 1e-3, assume_explicit=False))(
        probs
    )
    got = pallas_riccati.solve(
        probs, 1e-3, 1e-3, interpret=True, assume_explicit=False
    )
    for r, g in zip(ref, got):
        assert jnp.allclose(r, g, atol=1e-8)


def test_pallas_gains_and_runtime_mu_interpret():
    """``return_gains`` matches the scan factors; μ is a runtime (possibly
    per-element) input, exercised with two values through one trace."""
    N, nx, nu, nc = (6, 3, 2, 1)
    B = 128
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=jnp.float64)
    )(jax.random.split(jax.random.PRNGKey(1), B))

    run = jax.jit(
        lambda p, md, me: pallas_riccati.solve(
            p, md, me, interpret=True, return_gains=True
        )
    )
    for mudyn, mueq in [(1e-3, 1e-3), (1e-1, 1e-2)]:
        xs, us, vs, lams, gains = run(
            probs, jnp.float64(mudyn), jnp.float64(mueq)
        )
        facs = jax.vmap(
            lambda p: riccati.backward(p, mudyn, mueq, True)
        )(probs)
        for name in riccati._GAIN_FIELDS:
            r = getattr(facs, name)
            g = gains[name]
            if name in ("lff", "L", "yff", "Afb"):
                r, g = r[:, :N], g[:, :N]
            assert jnp.allclose(r, g, atol=1e-8), name


def test_solve_and_gains_vmap_fallback():
    """The custom_vmap dispatcher: unbatched == scan path; on CPU the rule
    takes the vmapped-scan fallback and must equal per-problem solves."""
    N, nx, nu, nc = (6, 3, 2, 1)
    B = 4  # not a multiple of 128 -> always fallback
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=jnp.float64)
    )(jax.random.split(jax.random.PRNGKey(2), B))
    out_v = jax.vmap(
        lambda p: riccati.solve_and_gains(p, 1e-3, 1e-3)
    )(probs)
    for b in range(B):
        one = jax.tree.map(lambda a: a[b], probs)
        out_1 = riccati.solve_and_gains(one, 1e-3, 1e-3)
        for rv, r1 in zip(
            jax.tree.leaves(out_v), jax.tree.leaves(out_1)
        ):
            assert jnp.allclose(rv[b], r1, atol=1e-10)


def test_pallas_availability_gate():
    prob = gar.random_problem(jax.random.PRNGKey(0), 5, 3, 2, 0)
    assert pallas_riccati.available(prob)
    big = gar.random_problem(jax.random.PRNGKey(0), 5, 12, 2, 0)
    assert not pallas_riccati.available(big)
