"""MPC cycling tests (reference design: ``tests/cycling.cpp:83`` and
``tests/mpc-cycle.cpp:136`` run receding-horizon loops asserting convergence
each cycle)."""

import jax
import jax.numpy as jnp

from aligator_tpu import solvers, utils
from aligator_tpu._pytree import replace
from tests.test_proxddp import make_lqr


def test_mpc_receding_horizon_lqr():
    """Receding-horizon loop on the double integrator: each cycle re-solves
    from the previous warm start after applying the first control; the state
    must be regulated toward the origin."""
    problem = make_lqr(nsteps=15, u_bound=0.3)
    cfg = solvers.ProxDDPConfig(tol=1e-6, max_iters=60)
    space = problem.space
    stage0 = problem.stage_at(0)

    x_cur = jnp.array([1.0, 0.0], jnp.float64)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)
    xs_w, us_w = res.xs, res.us

    @jax.jit
    def mpc_step(x_cur, xs_w, us_w):
        u0 = us_w[0]
        x_next = stage0.dynamics.forward(space, x_cur, u0)
        xs_w2, us_w2 = utils.cycle_warm_start(xs_w, us_w)
        prob2 = replace(problem, x0=x_next)
        res = solvers.solve(prob2, cfg, xs_init=xs_w2, us_init=us_w2)
        return x_next, res

    for _ in range(10):
        x_cur, res = mpc_step(x_cur, xs_w, us_w)
        xs_w, us_w = res.xs, res.us
        assert bool(res.conv)
        # bound satisfied up to the ALM tolerance scale
        assert float(jnp.max(jnp.abs(res.us))) <= 0.3 + 1e-4

    # regulated toward the origin (progress is rate-limited by the control
    # bound: vel saturates at the bound, position shrinks ~0.03/cycle)
    assert float(x_cur[0]) < 0.9
    assert float(x_cur[1]) < -0.25  # moving toward the origin at speed


def test_cycle_problem_rotates_stages():
    problem = make_lqr(nsteps=6)
    w = jnp.arange(1.0, 7.0)[:, None, None]
    stages = replace(problem.stages, cost=replace(problem.stages.cost, R=problem.stages.cost.R * w))
    problem = replace(problem, stages=stages)
    p2 = utils.cycle_problem(problem)
    # R weights rotated left: [2,3,4,5,6,1]
    got = p2.stages.cost.R[:, 0, 0] / problem.stages.cost.R[0, 0, 0] * 1.0
    assert jnp.allclose(got, jnp.array([2.0, 3.0, 4.0, 5.0, 6.0, 1.0]))


def test_history_recording():
    problem = make_lqr(nsteps=10, u_bound=0.2)
    cfg = solvers.ProxDDPConfig(tol=1e-7, max_iters=80, record_history=True)
    res = solvers.solve(problem, cfg)
    assert res.history is not None
    assert res.history.shape == (80, 7)
    n = int(res.num_iters)
    # primal infeasibility trace must be finite over executed iters
    assert bool(jnp.all(jnp.isfinite(res.history[1:n, 0])))
