"""Associative-scan (O(log N)-depth) Riccati solver vs the serial scan.

The two are the same μ-regularized recursion in different algebraic
clothing (see gar/associative.py); cross-validation against the serial
solver — itself validated against the dense KKT oracle and the native C++
oracle — is the correctness argument."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar, solvers
from aligator_tpu._pytree import replace
from aligator_tpu.gar import associative, riccati


@pytest.mark.parametrize(
    "seed,dims",
    [(0, (2, 3, 2, 1)), (1, (7, 4, 2, 2)), (2, (33, 5, 3, 0)),
     (3, (64, 4, 2, 1))],
)
def test_matches_serial(seed, dims):
    N, nx, nu, nc = dims
    prob = gar.random_problem(
        jax.random.PRNGKey(seed), N, nx, nu, nc, dtype=jnp.float64
    )
    # the folded 1/μ scale costs ~μ⁻¹·eps accuracy relative to the serial
    # reduced-KKT recursion (see module docstring), hence the μ-dependent
    # tolerance; refinement (tested below) recovers the rest
    for (mudyn, mueq), atol in [((1e-2, 1e-2), 1e-9), ((1e-4, 1e-4), 1e-5)]:
        ref = riccati.solve(prob, mudyn, mueq, assume_explicit=True)
        got = associative.solve(prob, mudyn, mueq)
        for r, g in zip(ref, got):
            scale = 1.0 + (jnp.abs(r).max() if r.size else 0.0)
            assert jnp.allclose(r, g, atol=atol * scale), (seed, mudyn)


def test_gains_match_serial():
    prob = gar.random_problem(
        jax.random.PRNGKey(5), 12, 4, 2, 2, dtype=jnp.float64
    )
    facs = riccati.backward(prob, 1e-3, 1e-3, assume_explicit=True)
    *_, got = associative.solve(prob, 1e-3, 1e-3, return_gains=True)
    N = prob.horizon
    for name in ("kff", "K", "zff", "Z"):
        assert jnp.allclose(
            getattr(facs, name), getattr(got, name), atol=1e-9
        ), name
    for name in ("lff", "L", "yff", "Afb"):
        assert jnp.allclose(
            getattr(facs, name)[:N], getattr(got, name)[:N], atol=1e-9
        ), name


def test_refinement_recovers_extreme_mu():
    """At μ = 1e-6 the penalty-folded scan alone loses ~5 digits (the 1/μ
    scale is squared inside the element algebra); one KKT-residual
    refinement restores solver-grade accuracy. (Below μ ≈ 1e-7 in fp64 the
    folded operator stops being a contraction — use the serial reduced-KKT
    path there, as the ProxDDP μ-floor does.)"""
    prob = gar.random_problem(
        jax.random.PRNGKey(9), 16, 4, 2, 2, dtype=jnp.float64
    )
    mudyn = mueq = 1e-6
    raw = associative.solve(prob, mudyn, mueq)
    ref1 = associative.solve(prob, mudyn, mueq, refine_steps=1)

    def kkt_max(sol):
        return float(
            jnp.max(jnp.stack(gar.kkt_error(prob, *sol, mudyn, mueq)))
        )

    assert kkt_max(ref1) < 1e-8
    assert kkt_max(ref1) <= kkt_max(raw)


def test_proxddp_associative_linear_solver():
    """ProxDDP with linear_solver='associative' converges to the serial
    solution on a double-integrator reach problem."""
    from examples.lqr import make_lqr_problem

    problem = make_lqr_problem(nsteps=24, dtype=jnp.float64)
    base = dict(tol=1e-8, mu_init=1e-3, max_iters=10, rollout="linear")
    res_s = solvers.solve(
        problem, solvers.ProxDDPConfig(**base, linear_solver="serial_scan")
    )
    res_a = solvers.solve(
        problem, solvers.ProxDDPConfig(**base, linear_solver="associative")
    )
    assert bool(res_a.conv)
    assert jnp.allclose(res_a.us, res_s.us, atol=1e-6)
    assert jnp.allclose(res_a.K, res_s.K, atol=1e-5)


def test_fp32_mu_floor_guard():
    """ProxDDP('associative') stays correct when μ leaves the fp32 scan
    domain (VERDICT r2 item 6): the runtime lax.cond guard falls back to
    the serial sweep per solve instead of silently diverging.

    Case (a): mu_init below the 1e-3 fp32 floor — every Newton step takes
    the fallback. Case (b): BCL tightening (mu_update_factor=0.01 from
    mu_init=0.01) crosses the floor mid-run on a box-constrained problem."""
    from examples.lqr import make_lqr_problem

    # (a) start below the floor
    problem = make_lqr_problem(nsteps=24, dtype=jnp.float32)
    base = dict(tol=1e-5, max_iters=10, rollout="linear")
    res_s = solvers.solve(
        problem,
        solvers.ProxDDPConfig(
            **base, mu_init=1e-4, linear_solver="serial_scan"
        ),
    )
    res_a = solvers.solve(
        problem,
        solvers.ProxDDPConfig(
            **base, mu_init=1e-4, linear_solver="associative"
        ),
    )
    assert bool(res_a.conv)
    assert jnp.allclose(res_a.us, res_s.us, atol=1e-4)

    # (b) BCL drives μ from 1e-2 through the floor on a constrained problem
    # (tight prim_tol0 forces a BCL failure → μ ← μ·1e-2 = 1e-4 < 1e-3)
    problem_b = make_lqr_problem(nsteps=24, dtype=jnp.float32, u_bound=0.05)
    cfg_b = dict(
        tol=3e-4, mu_init=1e-2, mu_update_factor=1e-2, prim_tol0=1e-4,
        max_iters=40, rollout="linear", record_history=True,
    )
    res_bs = solvers.solve(
        problem_b, solvers.ProxDDPConfig(**cfg_b, linear_solver="serial_scan")
    )
    res_ba = solvers.solve(
        problem_b, solvers.ProxDDPConfig(**cfg_b, linear_solver="associative")
    )
    assert bool(res_ba.conv)
    # the floor was actually crossed (history column 5 records μ per iter)
    n = int(res_ba.num_iters)
    assert float(jnp.min(res_ba.history[:n, 5])) < 1e-3
    assert jnp.allclose(res_ba.us, res_bs.us, atol=1e-3)


@pytest.mark.slow
def test_fp32_accuracy_domain():
    """fp32 accuracy of the associative path at the bench-protocol μ = 1e-3:
    with 3 Newton refinements in the combine solves + 2 KKT refinement
    steps it must beat the serial fp32 path against fp64 ground truth.
    (Below μ ≈ 1e-3 in fp32 the folded operator stops contracting — that
    domain is documented, not supported.)"""
    prob = gar.random_problem(
        jax.random.PRNGKey(3), 63, 4, 2, 2, dtype=jnp.float32
    )
    prob64 = jax.tree.map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, prob
    )
    mu = 1e-3
    _, us_t, _, _ = gar.solve(prob64, mu, mu, assume_explicit=True)
    _, us_a, _, _ = associative.solve(prob, mu, mu, refine_steps=2)
    _, us_s, _, _ = gar.solve(prob, mu, mu, assume_explicit=True)
    scale = jnp.max(jnp.abs(us_t))
    err_a = float(jnp.max(jnp.abs(us_a - us_t)) / scale)
    err_s = float(jnp.max(jnp.abs(us_s - us_t)) / scale)
    assert err_a < 1e-5, err_a
    assert err_a <= err_s, (err_a, err_s)
