"""Parallel-in-time Riccati vs serial solver (reference test design:
``tests/gar/parallel.cpp`` cross-validates parallel against serial and
checks KKT residuals)."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar
from aligator_tpu.gar import parallel

MUDYN = 1e-3
MUEQ = 1e-4


@pytest.mark.parametrize("legs", [2, 4])
@pytest.mark.parametrize("dims", [(7, 4, 3, 2), (15, 6, 2, 0)])
def test_parallel_vs_serial(legs, dims):
    N, nx, nu, nc = dims
    key = jax.random.PRNGKey(42 + legs)
    prob = gar.random_problem(key, N, nx, nu, nc, dtype=jnp.float64)

    xs_s, us_s, vs_s, lams_s = gar.solve(prob, MUDYN, MUEQ, assume_explicit=True)
    xs_p, us_p, vs_p, lams_p = parallel.solve(
        prob, MUDYN, MUEQ, legs=legs, assume_explicit=True
    )

    assert jnp.allclose(xs_p, xs_s, atol=1e-8)
    assert jnp.allclose(us_p, us_s, atol=1e-8)
    assert jnp.allclose(vs_p, vs_s, atol=1e-8)
    assert jnp.allclose(lams_p, lams_s, atol=1e-8)

    derr, cerr, gerr = gar.kkt_error(
        prob, xs_p, us_p, vs_p, lams_p, MUDYN, MUEQ
    )
    assert max(float(derr), float(cerr), float(gerr)) < 1e-8


def test_parallel_general_e():
    from aligator_tpu._pytree import replace

    N, nx, nu, nc = 11, 4, 2, 1
    prob = gar.random_problem(jax.random.PRNGKey(3), N, nx, nu, nc, dtype=jnp.float64)
    E = prob.knots.E
    pert = 0.2 * jax.random.normal(jax.random.PRNGKey(9), E[:N].shape, dtype=E.dtype)
    prob = replace(prob, knots=replace(prob.knots, E=E.at[:N].add(pert)))

    xs_s, us_s, vs_s, lams_s = gar.solve(prob, MUDYN, MUEQ)
    xs_p, us_p, vs_p, lams_p = parallel.solve(prob, MUDYN, MUEQ, legs=3)
    assert jnp.allclose(xs_p, xs_s, atol=1e-8)
    assert jnp.allclose(lams_p, lams_s, atol=1e-8)


def test_parallel_jit_vmap():
    """Parallel solver composes with jit and an outer scenario vmap."""
    N, nx, nu, nc = 7, 3, 2, 1
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=jnp.float64)
    )(keys)

    @jax.jit
    def run(probs):
        return jax.vmap(
            lambda p: parallel.solve(p, MUDYN, MUEQ, legs=2, assume_explicit=True)
        )(probs)

    xs, us, vs, lams = run(probs)
    assert xs.shape == (4, 8, nx)
    for i in range(4):
        prob_i = jax.tree.map(lambda a: a[i], probs)
        errs = gar.kkt_error(prob_i, xs[i], us[i], vs[i], lams[i], MUDYN, MUEQ)
        assert max(float(e) for e in errs) < 1e-8


@pytest.mark.parametrize("legs", [2, 4])
def test_parallel_gains_collapse(legs):
    """Parallel-path gains: collapsed stage-0 feedback equals the serial
    solver's K[0] (reference collapseFeedback, parallel-solver.hpp:55-66),
    and u_t = kff_t + K_t x_t reproduces the solution controls at every
    stage."""
    from aligator_tpu.gar import riccati

    N, nx, nu, nc = 11, 4, 3, 2
    prob = gar.random_problem(
        jax.random.PRNGKey(7 + legs), N, nx, nu, nc, dtype=jnp.float64
    )

    factors = riccati.backward(prob, MUDYN, MUEQ, assume_explicit=True)
    xs, us, vs, lams, gains = parallel.solve(
        prob, MUDYN, MUEQ, legs=legs, assume_explicit=True, return_gains=True
    )

    # collapsed first-stage feedback matches serial
    assert jnp.allclose(gains.K[0], factors.K[0], atol=1e-8)
    # self-consistency: gains reproduce the solution controls at every stage
    us_from_gains = gains.kff + jnp.einsum("tun,tn->tu", gains.K, xs)
    assert jnp.allclose(us_from_gains, us, atol=1e-8)
    # last leg is unparameterized: its feedback matches serial exactly
    m = (N + 1) // legs
    assert jnp.allclose(gains.K[-m:], factors.K[-m:], atol=1e-8)


def test_condensed_refinement_fp32():
    """fp32 many-leg solve: condensed-system iterative refinement keeps the
    parallel solution close to the serial one (reference
    parallel-solver.hxx:148-175)."""
    N, nx, nu, nc = 31, 6, 3, 2
    prob = gar.random_problem(
        jax.random.PRNGKey(5), N, nx, nu, nc, dtype=jnp.float32
    )
    xs_p, us_p, _, _ = parallel.solve(
        prob, 1e-2, 1e-2, legs=16, assume_explicit=True, refine_steps=2
    )
    # ground truth: the fp64 serial solve (the fp32 serial path carries its
    # own ~1e-5 rounding noise, so parallel-vs-serial in fp32 only bounds
    # the SUM of both errors; truth-referenced bounds are the honest check)
    prob64 = jax.tree.map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, prob
    )
    xs_t, us_t, _, _ = gar.solve(prob64, 1e-2, 1e-2, assume_explicit=True)
    assert jnp.max(jnp.abs(us_p - us_t)) / jnp.max(jnp.abs(us_t)) < 1e-5
    assert jnp.max(jnp.abs(xs_p - xs_t)) / jnp.max(jnp.abs(xs_t)) < 1e-5


@pytest.mark.parametrize("legs,N", [(3, 9), (4, 12), (5, 15)])
def test_parallel_balanced_split(legs, N):
    """Non-divisible horizons use the balanced get_work split (reference
    gar/work.hpp:17-22): T % legs legs get one extra knot; the result still
    matches the serial solver."""
    prob = gar.random_problem(
        jax.random.PRNGKey(100 + legs), N, 4, 2, 1, dtype=jnp.float64
    )  # T = N+1 not divisible by legs
    assert (N + 1) % legs != 0
    xs_s, us_s, vs_s, lams_s = gar.solve(prob, MUDYN, MUEQ, assume_explicit=True)
    xs_p, us_p, vs_p, lams_p, gains = parallel.solve(
        prob, MUDYN, MUEQ, legs=legs, assume_explicit=True, return_gains=True
    )
    assert jnp.allclose(xs_p, xs_s, atol=1e-8)
    assert jnp.allclose(us_p, us_s, atol=1e-8)
    assert jnp.allclose(vs_p, vs_s, atol=1e-8)
    assert jnp.allclose(lams_p, lams_s, atol=1e-8)
    # collapsed stage-0 feedback still matches serial
    from aligator_tpu.gar import riccati

    factors = riccati.backward(prob, MUDYN, MUEQ, assume_explicit=True)
    assert jnp.allclose(gains.K[0], factors.K[0], atol=1e-8)
    us_from_gains = gains.kff + jnp.einsum("tun,tn->tu", gains.K, xs_p)
    assert jnp.allclose(us_from_gains, us_p, atol=1e-8)


def test_get_work_balanced():
    starts, lens = parallel.get_work(10, 3)
    assert starts == [0, 4, 7] and lens == [4, 3, 3]
    starts, lens = parallel.get_work(12, 4)
    assert starts == [0, 3, 6, 9] and lens == [3, 3, 3, 3]


@pytest.mark.parametrize("legs", [2, 4, 8])
def test_parallel_medium_dims_convex(legs):
    """Medium-dim (nx=36 — the reference gar bench shape,
    bench/gar-riccati.cpp:18) leg solve on JOINTLY convex stage costs (the
    pivot-free kernel's operating domain, see parallel.py module docstring
    and gar.random_convex_problem): matches the serial sweep. Regression
    for the round-3 finding that indefinite random_problem draws can NaN
    a leg sweep at these dims."""
    prob = gar.random_convex_problem(
        jax.random.PRNGKey(17), 23, 36, 12, 2, dtype=jnp.float64
    )
    xs_s, us_s, vs_s, lams_s = gar.solve(prob, MUDYN, MUEQ, assume_explicit=True)
    xs_p, us_p, vs_p, lams_p = parallel.solve(
        prob, MUDYN, MUEQ, legs=legs, assume_explicit=True
    )
    assert jnp.allclose(xs_p, xs_s, atol=1e-8)
    assert jnp.allclose(us_p, us_s, atol=1e-8)
    assert jnp.allclose(vs_p, vs_s, atol=1e-8)
    assert jnp.allclose(lams_p, lams_s, atol=1e-7)
