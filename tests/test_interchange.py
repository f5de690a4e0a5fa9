"""Problem interchange + true parity harness (round-5 VERDICT item 4).

The compat-layer capability (reference
``include/aligator/compat/crocoddyl/problem-wrap.hpp:14``): ingest a
problem this framework did NOT build.  The checked-in instances under
``tests/data`` are produced by ``tools/make_reference_instances.py`` — a
numpy-only generator transcribing the published reference problem
definitions (``examples/lqr.py:33-80``, ``examples/se2-car.hpp:63-103``)
straight into the serialized format, independent of aligator_tpu's
constructors.  Each imported instance is then solved by BOTH the JAX
ProxDDP solver and the independent NumPy fp64 oracle, and the controls
must match to 1e-4 on the IDENTICAL imported instance — the
apples-to-apples parity protocol the reference's own tests use.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import core, gar, solvers
from aligator_tpu.oracle import NumpyProxDDP
from aligator_tpu.utils import interchange

DATA = pathlib.Path(__file__).parent / "data"


def _solve_both(problem, cfg):
    res = solvers.solve(problem, cfg)
    tr = NumpyProxDDP(problem, cfg).solve()
    return res, tr


@pytest.mark.parametrize(
    "name,mu0",
    [("ref_lqr", 1e-4), ("ref_lqr_bounded", 1e-1), ("ref_lqr_term_cstr", 1e-4)],
)
def test_imported_lqr_instances_parity(name, mu0):
    """Imported reference LQR instances (plain / box-bounded / terminal
    equality — the three examples/lqr.py configurations): both independent
    solvers converge on the identical imported instance and agree on the
    controls to 1e-4 (tighter in practice)."""
    problem = interchange.load_problem(DATA / f"{name}.npz")
    cfg = solvers.ProxDDPConfig(tol=1e-8, mu_init=mu0, max_iters=20)
    res, tr = _solve_both(problem, cfg)
    assert bool(res.conv)
    assert bool(tr.conv)
    assert float(jnp.abs(res.us - tr.us).max()) < 1e-4
    assert float(jnp.abs(res.xs - tr.xs).max()) < 1e-4


def test_imported_lqr_matches_dense_kkt():
    """The imported plain-LQR instance must satisfy exact stationarity of
    its own dense KKT system (independent of both iterative solvers)."""
    problem = interchange.load_problem(DATA / "ref_lqr.npz")
    cfg = solvers.ProxDDPConfig(tol=1e-10, mu_init=1e-4, max_iters=20)
    res = solvers.solve(problem, cfg)
    stage = problem.stage_at(0)
    A, B, c = stage.dynamics.A, stage.dynamics.B, stage.dynamics.c
    xerr = res.xs[1:] - (res.xs[:-1] @ A.T + res.us @ B.T + c)
    assert float(jnp.abs(xerr).max()) < 1e-8
    # stationarity: R u + N' x + B' lam_next = 0
    R = 1e-2 * jnp.eye(3)
    N = 1e-5 * jnp.eye(3)
    ru = res.us @ R.T + res.xs[:-1] @ N + res.lams[1:] @ B
    assert float(jnp.abs(ru).max()) < 1e-6


def test_imported_se2_car_parity():
    """Imported SE(2)-car (the north-star benchmark problem, transcribed
    from examples/se2-car.hpp): JAX solver vs NumPy oracle on the
    identical imported instance."""
    problem = interchange.load_problem(DATA / "ref_se2_car.npz")
    cfg = solvers.ProxDDPConfig(tol=1e-6, mu_init=1e-2, max_iters=12)
    res, tr = _solve_both(problem, cfg)
    assert bool(res.conv) and bool(tr.conv)
    assert float(jnp.abs(res.us - tr.us).max()) < 1e-4
    # driving toward the origin (the soft 0.01·dt state weight does not
    # park exactly within this horizon — progress, not arrival)
    assert float(jnp.linalg.norm(res.xs[-1][:2])) < 0.9 * float(
        jnp.linalg.norm(res.xs[0][:2])
    )


def test_imported_se2_car_matches_native_example():
    """The imported instance must be the SAME problem as the in-repo
    se2-car constructor (same costs, dynamics, x0) — evaluation equality
    on a common trajectory."""
    from examples.se2_car import create_se2_problem

    imported = interchange.load_problem(DATA / "ref_se2_car.npz")
    native = create_se2_problem(nsteps=50, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    us = 0.1 * jax.random.normal(key, (50, 2), jnp.float64)
    from aligator_tpu.utils.rollout import rollout

    xs = rollout(native.stages.dynamics, native.space, native.x0, us)
    d_imp = core.evaluate(imported, xs, us)
    d_nat = core.evaluate(native, xs, us)
    assert abs(float(d_imp.cost) - float(d_nat.cost)) < 1e-12
    assert float(jnp.abs(d_imp.dyn_res - d_nat.dyn_res).max()) < 1e-12


def test_save_load_round_trip_se2():
    from examples.se2_car import create_se2_problem

    problem = create_se2_problem(nsteps=12, dtype=jnp.float64, u_bound=0.5)
    path = DATA / "_rt_se2.npz"
    interchange.save_problem(path, problem)
    loaded = interchange.load_problem(path)
    for a, b in zip(jax.tree.leaves(problem), jax.tree.leaves(loaded)):
        assert jnp.asarray(a).shape == jnp.asarray(b).shape
        assert float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) == 0.0
    path.unlink()


def test_save_load_stage_varying_cost():
    """Stage-varying cost targets survive the round trip (the framework's
    stacked-leaf heterogeneity model maps to stacked arrays)."""
    dt = jnp.float64
    space = core.VectorSpace(2)
    A = jnp.eye(2, dtype=dt)
    dyn = core.LinearDiscreteDynamics(
        A=A, B=jnp.eye(2, dtype=dt), c=jnp.zeros(2, dt)
    )
    N = 8
    targets = jnp.linspace(0.0, 1.0, N)[:, None] * jnp.ones((N, 2), dt)
    cost = core.QuadraticStateCost(jnp.zeros(2, dt), jnp.eye(2, dtype=dt))
    stage = core.make_stage(cost, dyn, space, 2)
    stages = core.replicate_stage(stage, N)
    from aligator_tpu._pytree import replace

    stages = replace(
        stages,
        cost=replace(
            stages.cost, residual=replace(stages.cost.residual, target=targets)
        ),
    )
    problem = core.make_problem(
        jnp.zeros(2, dt), stage, N,
        core.QuadraticStateCost(jnp.ones(2, dt), jnp.eye(2, dtype=dt)),
        stages=stages,
    )
    path = DATA / "_rt_varying.npz"
    interchange.save_problem(path, problem)
    loaded = interchange.load_problem(path)
    xs = jnp.ones((N + 1, 2), dt)
    us = jnp.zeros((N, 2), dt)
    d0 = core.evaluate(problem, xs, us)
    d1 = core.evaluate(loaded, xs, us)
    assert float(jnp.abs(d0.stage_costs - d1.stage_costs).max()) == 0.0
    # the stage costs genuinely vary (the stacked leaf was restored)
    assert float(jnp.std(d0.stage_costs)) > 1e-3
    path.unlink()


def test_lqr_gar_level_round_trip():
    """gar-level LQ interchange: save/load a random convex LQRProblem and
    check the dense-KKT solutions coincide."""
    prob = gar.random_convex_problem(
        jax.random.PRNGKey(3), 10, 4, 2, 1, dtype=jnp.float64
    )
    path = DATA / "_rt_lqr.npz"
    interchange.save_lqr(path, prob)
    loaded = interchange.load_lqr(path)
    for k in interchange._LQR_FIELDS:
        a, b = getattr(prob.knots, k), getattr(loaded.knots, k)
        assert float(jnp.abs(a - b).max()) == 0.0
    s0 = gar.dense_solve(prob, 1e-7, 1e-7)
    s1 = gar.dense_solve(loaded, 1e-7, 1e-7)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        assert float(jnp.abs(a - b).max()) == 0.0
    path.unlink()
