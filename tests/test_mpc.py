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


def test_mpc_warm_start_converges_in_two_iters():
    """Reference ``tests/mpc-cycle.cpp:136``: a warm-started cycled solve must
    converge in ~1-2 inner iterations — the amortization property that makes
    receding-horizon MPC real-time."""
    # warm cycles run at mu_init=1e-8, the reference MPC protocol
    # (tests/mpc-cycle.cpp:166); the cold first solve uses the default mu
    problem = make_lqr(nsteps=20)
    cfg = solvers.ProxDDPConfig(tol=1e-6, mu_init=1e-8, max_iters=60)
    space = problem.space
    stage0 = problem.stage_at(0)

    res = solvers.solve(problem, solvers.ProxDDPConfig(tol=1e-8, max_iters=60))
    assert bool(res.conv)
    x_cur = problem.x0
    for _ in range(6):
        x_cur = stage0.dynamics.forward(space, x_cur, res.us[0])
        xs_w, us_w, vs_w, lams_w = utils.cycle_warm_start(
            res.xs, res.us, res.vs, res.lams, problem=problem
        )
        res = solvers.solve(
            replace(problem, x0=x_cur), cfg,
            xs_init=xs_w, us_init=us_w, vs_init=vs_w, lams_init=lams_w,
        )
        assert bool(res.conv)
        assert int(res.num_iters) <= 2

    # with control bounds, active-set changes at mu=1e-8 legitimately cost
    # extra Newton iterations on some cycles; every cycle must still converge
    # and steady-state cycles must stay amortized
    problem = make_lqr(nsteps=20, u_bound=0.3)
    res = solvers.solve(problem, solvers.ProxDDPConfig(tol=1e-8, max_iters=80))
    assert bool(res.conv)
    x_cur = problem.x0
    counts = []
    for _ in range(6):
        x_cur = stage0.dynamics.forward(space, x_cur, res.us[0])
        xs_w, us_w, vs_w, lams_w = utils.cycle_warm_start(
            res.xs, res.us, res.vs, res.lams, problem=problem
        )
        res = solvers.solve(
            replace(problem, x0=x_cur), cfg,
            xs_init=xs_w, us_init=us_w, vs_init=vs_w, lams_init=lams_w,
        )
        assert bool(res.conv)
        counts.append(int(res.num_iters))
    assert sorted(counts)[len(counts) // 2] <= 3  # median amortized


def test_mpc_gains_feedback():
    """Between solves an MPC loop applies u = u* + K(x - x*): for LQR the
    gain-corrected control must match a fresh solve from the perturbed state
    (reference exposes exactly this via getFeedback, results-base.hpp:9-55)."""
    problem = make_lqr(nsteps=25)
    cfg = solvers.ProxDDPConfig(tol=1e-10, max_iters=30)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)

    dx = jnp.array([0.05, -0.03], jnp.float64)
    u_fb = res.us[0] + res.kff[0] + res.K[0] @ dx

    res2 = solvers.solve(replace(problem, x0=problem.x0 + dx), cfg)
    assert bool(res2.conv)
    # the proximal gains carry an O(μ) bias; they must land within the 1e-4
    # control-match criterion and far closer than the uncorrected control
    err_fb = float(jnp.max(jnp.abs(u_fb - res2.us[0])))
    err_ff = float(jnp.max(jnp.abs(res.us[0] - res2.us[0])))
    assert err_fb < 1e-4
    assert err_fb < 1e-2 * err_ff


def test_verbose_and_callback_traces():
    """In-jit observability: the user callback (reference callback registry,
    solver-proxddp.hpp:281-309) receives one trace dict per inner iteration
    with the Logger's columns, from inside jit."""
    rows = []
    problem = make_lqr(nsteps=10)
    cfg = solvers.ProxDDPConfig(
        tol=1e-8, max_iters=20, callback=rows.append
    )

    res = jax.jit(lambda p: solvers.solve(p, cfg))(problem)
    jax.effects_barrier()
    assert bool(res.conv)
    assert len(rows) == int(res.num_iters)
    for key in ("iter", "al_iter", "alpha", "prim_err", "dual_err",
                "inner_crit", "cost", "merit", "mu"):
        assert key in rows[0]
    # iterations are reported in order
    assert [r["iter"] for r in rows] == list(range(1, len(rows) + 1))


def test_history_recording():
    problem = make_lqr(nsteps=10, u_bound=0.2)
    cfg = solvers.ProxDDPConfig(tol=1e-7, max_iters=80, record_history=True)
    res = solvers.solve(problem, cfg)
    assert res.history is not None
    assert res.history.shape == (80, 8)
    n = int(res.num_iters)
    # primal infeasibility trace must be finite over executed iters
    assert bool(jnp.all(jnp.isfinite(res.history[1:n, 0])))
