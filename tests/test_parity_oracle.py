"""Full-solver parity: the JAX ProxDDP vs the independent NumPy fp64 oracle.

This is the end-to-end acceptance loop the north star asks for ("controls
match aligator to 1e-4"): the oracle re-implements the complete serial
ProxDDP of the reference (``solver-proxddp.hxx:458-741``) with plain NumPy
loops and full-KKT LU factorizations — a different algorithmic route through
the same math — and the JAX solver must reproduce its iterates one-for-one
at identical iteration budgets (the reference's own cross-solver test
strategy, ``tests/gar/parallel.cpp``, ``tests/python/test_solver.py``).
"""

import dataclasses

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import core, solvers
from aligator_tpu.oracle import NumpyProxDDP


def _check_parity(problem, cfg, iter_tol=1e-8, final_tol=1e-4):
    cfg_tr = dataclasses.replace(cfg, record_history_trajs=True)
    res = solvers.solve(problem, cfg_tr)
    tr = NumpyProxDDP(problem, cfg).solve()

    k_jax = int(res.num_iters)
    assert k_jax == tr.num_iters, (k_jax, tr.num_iters)
    assert bool(res.conv) == tr.conv

    # iterate-by-iterate control match
    for k in range(min(k_jax, len(tr.us_hist))):
        du = np.max(np.abs(np.asarray(res.history_us[k]) - tr.us_hist[k]))
        assert du < iter_tol, f"iterate {k}: |Δu| = {du}"

    # final-solution match (the 1e-4 criterion, at much tighter tolerance)
    assert np.max(np.abs(np.asarray(res.us) - tr.us)) < final_tol
    assert np.max(np.abs(np.asarray(res.xs) - tr.xs)) < final_tol
    return res, tr


def _make_lqr(nsteps=30, u_bound=None, dtype=jnp.float64):
    dt_ = 0.1
    space = core.VectorSpace(2)
    nu = 1
    A = jnp.array([[1.0, dt_], [0.0, 1.0]], dtype)
    B = jnp.array([[0.0], [dt_]], dtype)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((2,), dtype))
    cost = core.QuadraticCost.create(
        0.01 * jnp.eye(2, dtype=dtype), 0.01 * jnp.eye(1, dtype=dtype)
    )
    term_cost = core.QuadraticCost.create(
        10.0 * jnp.eye(2, dtype=dtype), jnp.zeros((1, 1), dtype)
    )
    constraints = ()
    if u_bound is not None:
        constraints = (
            (
                core.ControlErrorResidual(target=jnp.zeros((nu,), dtype)),
                core.BoxConstraint(
                    lower=-u_bound * jnp.ones((nu,), dtype),
                    upper=u_bound * jnp.ones((nu,), dtype),
                ),
            ),
        )
    stage = core.make_stage(cost, dyn, space, nu, constraints)
    return core.make_problem(
        jnp.array([1.0, 0.0], dtype), stage, nsteps, term_cost
    )


def test_parity_lqr():
    problem = _make_lqr(nsteps=30)
    cfg = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=20, ls_strategy="armijo", ls_interp="bisection"
    )
    res, tr = _check_parity(problem, cfg)
    assert bool(res.conv)


def test_parity_lqr_box_constrained():
    problem = _make_lqr(nsteps=25, u_bound=0.12)
    cfg = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=80, ls_strategy="armijo", ls_interp="bisection"
    )
    res, tr = _check_parity(problem, cfg)
    assert bool(res.conv)


def test_parity_lqr_default_linesearch():
    """Default-config path: nonmonotone LS + cubic interpolation."""
    problem = _make_lqr(nsteps=25, u_bound=0.12)
    cfg = solvers.ProxDDPConfig(tol=1e-8, max_iters=80)
    res, tr = _check_parity(problem, cfg)
    assert bool(res.conv)


def test_parity_se2_car():
    """The headline benchmark problem (bench/se2-car.cpp protocol dims) —
    SE(2) manifold, obstacle/bounds constraints."""
    from examples.se2_car import create_se2_problem

    problem = create_se2_problem(nsteps=20, dtype=jnp.float64)
    cfg = solvers.ProxDDPConfig(
        tol=1e-6, mu_init=1e-3, max_iters=30,
        ls_strategy="armijo", ls_interp="bisection",
    )
    res, tr = _check_parity(problem, cfg, iter_tol=1e-7)
    assert bool(res.conv)


@pytest.mark.slow
def test_parity_ur5_reach():
    """Multibody workload: UR5 end-effector reach (examples/ur5_reach.py)."""
    from examples.ur5_reach import create_ur5_problem

    problem, _, _ = create_ur5_problem(nsteps=20, dtype=jnp.float64)
    cfg = solvers.ProxDDPConfig(
        tol=1e-5, max_iters=60, ls_strategy="armijo", ls_interp="bisection"
    )
    res, tr = _check_parity(problem, cfg, iter_tol=1e-6)
    assert bool(res.conv)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_fuzz_random_constrained_lqr(seed):
    """Randomized cross-validation: random stable dynamics, random SPD
    costs, random box bounds — the JAX solver must track the NumPy oracle
    iterate-for-iterate on every draw (catches active-set/linesearch
    discrepancies that fixed examples might miss)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dtype = jnp.float64
    nx = int(2 + seed % 2)
    nu = int(1 + seed % 2)

    A = jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(k1, (nx, nx), dtype)
    A = A / jnp.maximum(1.0, 1.05 * jnp.max(jnp.abs(jnp.linalg.eigvals(A))))
    A = A.real.astype(dtype)
    B = jax.random.normal(k2, (nx, nu), dtype)
    W = jax.random.normal(k3, (nx, nx + 2), dtype)
    Q = (W @ W.T) / (nx + 2) * 0.1
    Rw = jax.random.normal(k4, (nu, nu + 2), dtype)
    R = (Rw @ Rw.T) / (nu + 2) * 0.1 + 0.01 * jnp.eye(nu, dtype=dtype)

    space = core.VectorSpace(nx)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((nx,), dtype))
    cost = core.QuadraticCost.create(Q, R)
    term_cost = core.QuadraticCost.create(
        5.0 * jnp.eye(nx, dtype=dtype), jnp.zeros((nu, nu), dtype)
    )
    u_bound = 0.1 + 0.2 * float(jax.random.uniform(k5))
    constraints = (
        (
            core.ControlErrorResidual(target=jnp.zeros((nu,), dtype)),
            core.BoxConstraint(
                lower=-u_bound * jnp.ones((nu,), dtype),
                upper=u_bound * jnp.ones((nu,), dtype),
            ),
        ),
    )
    stage = core.make_stage(cost, dyn, space, nu, constraints)
    x0 = jax.random.normal(jax.random.PRNGKey(100 + seed), (nx,), dtype)
    problem = core.make_problem(x0, stage, 20, term_cost)

    cfg = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=60, ls_strategy="armijo", ls_interp="bisection"
    )
    _check_parity(problem, cfg)
