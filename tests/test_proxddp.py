"""ProxDDP solver tests (counterpart of reference
``tests/python/test_solver.py``): LQR convergence, box-constrained LQR with
both rollout types, terminal equality constraints, batched solves."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import core, solvers
from aligator_tpu._pytree import replace


def make_lqr(nsteps=20, u_bound=None, dtype=jnp.float64):
    dt_ = 0.1
    space = core.VectorSpace(2)
    nu = 1
    A = jnp.array([[1.0, dt_], [0.0, 1.0]], dtype)
    B = jnp.array([[0.0], [dt_]], dtype)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((2,), dtype))
    cost = core.QuadraticCost.create(
        0.001 * jnp.eye(2, dtype=dtype), 0.001 * jnp.eye(1, dtype=dtype)
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


def test_lqr_converges_fast():
    problem = make_lqr(nsteps=100)
    res = solvers.solve(problem, solvers.ProxDDPConfig(tol=1e-8, max_iters=10))
    assert bool(res.conv)
    assert int(res.num_iters) <= 5
    assert float(res.prim_infeas) < 1e-8
    assert float(res.dual_infeas) < 1e-8


def test_lqr_matches_dense_kkt():
    """Unconstrained LQR: ProxDDP solution must satisfy the exact first-order
    conditions (costate recursion + input stationarity)."""
    problem = make_lqr(nsteps=30)
    res = solvers.solve(problem, solvers.ProxDDPConfig(tol=1e-10, max_iters=10))
    stage = problem.stage_at(0)
    A, B = stage.dynamics.A, stage.dynamics.B
    Q = stage.cost.residual if False else None
    xs, us, lams = res.xs, res.us, res.lams
    # dynamics feasibility
    xerr = xs[1:] - (xs[:-1] @ A.T + us @ B.T)
    assert float(jnp.max(jnp.abs(xerr))) < 1e-8
    # stationarity in u: R u + B' λ_{t+1} = 0  (R = 0.001 I)
    # costates solved by the proximal system: E'λ = -λ (E=-I)
    ru = 0.001 * us + lams[1:] @ B
    assert float(jnp.max(jnp.abs(ru))) < 1e-6


@pytest.mark.parametrize("rollout", ["linear", "nonlinear"])
def test_box_constrained_lqr(rollout):
    problem = make_lqr(nsteps=20, u_bound=0.1)
    cfg = solvers.ProxDDPConfig(tol=1e-8, max_iters=150, rollout=rollout)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)
    assert float(jnp.max(jnp.abs(res.us))) <= 0.1 + 1e-7
    # the bound must actually be active somewhere for this config
    assert float(jnp.max(jnp.abs(res.us))) > 0.0999


def test_rollout_types_agree():
    problem = make_lqr(nsteps=20, u_bound=0.1)
    r1 = solvers.solve(
        problem, solvers.ProxDDPConfig(tol=1e-8, max_iters=150, rollout="linear")
    )
    r2 = solvers.solve(
        problem,
        solvers.ProxDDPConfig(tol=1e-8, max_iters=150, rollout="nonlinear"),
    )
    assert bool(r1.conv) and bool(r2.conv)
    assert float(jnp.max(jnp.abs(r1.us - r2.us))) < 1e-7


def test_terminal_equality_constraint():
    problem = make_lqr(nsteps=30)
    target = jnp.array([0.25, -0.1], jnp.float64)
    tc = (
        core.StateErrorResidual(target=target),
        core.EqualityConstraint(),
    )
    problem = replace(
        problem, term_constraints=(tc,), term_cstr_dims=(2,)
    )
    res = solvers.solve(
        problem, solvers.ProxDDPConfig(tol=1e-9, max_iters=100)
    )
    assert bool(res.conv)
    assert float(jnp.max(jnp.abs(res.xs[-1] - target))) < 1e-7


def test_batched_vmap_jit():
    problem = make_lqr(nsteps=20, u_bound=0.15)
    cfg = solvers.ProxDDPConfig(tol=1e-6, max_iters=120)

    @jax.jit
    def solve_batch(x0s):
        return jax.vmap(lambda x0: solvers.solve(replace(problem, x0=x0), cfg))(
            x0s
        )

    x0s = jnp.array([[1.0, 0.0], [-1.0, 0.5], [0.3, -0.2]], jnp.float64)
    res = solve_batch(x0s)
    assert res.us.shape == (3, 20, 1)
    assert bool(jnp.all(res.conv))
    assert float(jnp.max(jnp.abs(res.us))) <= 0.15 + 1e-6


def test_stage_varying_costs():
    """Per-stage parameter heterogeneity through stacked stage leaves."""
    problem = make_lqr(nsteps=10)
    # make the control weight grow over time
    stages = problem.stages
    w = jnp.linspace(1.0, 5.0, 10)[:, None, None]
    # QuadraticCost R leaf is stages.cost.R with shape (10, 1, 1)
    stages = replace(stages, cost=replace(stages.cost, R=stages.cost.R * w))
    problem = replace(problem, stages=stages)
    res = solvers.solve(problem, solvers.ProxDDPConfig(tol=1e-8, max_iters=20))
    assert bool(res.conv)


@pytest.mark.parametrize("strategy", ["nonmonotone", "armijo", "filter"])
def test_all_step_acceptance_strategies(strategy):
    """Reference test_solver.py: box-constrained LQR with all 3 step
    acceptance strategies."""
    problem = make_lqr(nsteps=20, u_bound=0.1)
    cfg = solvers.ProxDDPConfig(tol=1e-8, max_iters=150, ls_strategy=strategy)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)
    assert float(jnp.max(jnp.abs(res.us))) <= 0.1 + 1e-6


@pytest.mark.parametrize("mode", ["newton", "primal", "primal_dual"])
def test_multiplier_update_modes(mode):
    problem = make_lqr(nsteps=20, u_bound=0.1)
    cfg = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=150, multiplier_update_mode=mode
    )
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)


def test_parallel_linear_solver_matches_serial():
    """ProxDDP with the parallel-in-time LQ solver (reference
    LQSolverChoice::PARALLEL) produces the same iterates as serial."""
    problem = make_lqr(nsteps=19, u_bound=0.2)  # T = 20, legs = 4
    cfg_s = solvers.ProxDDPConfig(tol=1e-8, max_iters=100)
    cfg_p = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=100, linear_solver="parallel", parallel_legs=4
    )
    r1 = solvers.solve(problem, cfg_s)
    r2 = solvers.solve(problem, cfg_p)
    assert bool(r1.conv) and bool(r2.conv)
    assert float(jnp.max(jnp.abs(r1.us - r2.us))) < 1e-9


def test_bench_protocol_se2_car_fp32():
    """Regression guard for the headline benchmark workload: the SE(2)-car
    problem (bench/se2-car.cpp protocol) must converge quickly in fp32."""
    from examples.se2_car import create_se2_problem

    problem = create_se2_problem(nsteps=50, dtype=jnp.float32)
    cfg = solvers.ProxDDPConfig(
        tol=1e-3, mu_init=1e-3, max_iters=10, max_al_iters=10,
        rollout="linear", ls_max_steps=6,
    )
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)
    assert int(res.num_iters) <= 8
    assert bool(jnp.isfinite(res.us).all())
