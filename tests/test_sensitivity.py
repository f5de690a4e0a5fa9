"""Solver-level θ sensitivities (round-5 VERDICT item 7).

``th_grad``/``th_hess`` of the optimal value V(θ) exposed on
:class:`ProxDDPResults`, validated against central finite differences of
independent converged solves (the reference surfaces the same quantities
through ``RiccatiSolverBase::thGrad/thHess``, gar/riccati-base.hpp:26-34).
"""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import core, solvers


def problem_of_theta_factory(u_bound=None, nsteps=20, dtype=jnp.float64):
    """θ (2,) shifts the terminal state target of a double integrator."""
    dt_ = 0.1
    space = core.VectorSpace(2)
    nu = 1
    A = jnp.array([[1.0, dt_], [0.0, 1.0]], dtype)
    B = jnp.array([[0.0], [dt_]], dtype)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((2,), dtype))
    cost = core.QuadraticCost.create(
        0.01 * jnp.eye(2, dtype=dtype), 0.01 * jnp.eye(1, dtype=dtype)
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

    def problem_of_theta(theta):
        term_cost = core.QuadraticStateCost(
            theta, 10.0 * jnp.eye(2, dtype=dtype)
        )
        stage = core.make_stage(cost, dyn, space, nu, constraints)
        return core.make_problem(
            jnp.array([1.0, 0.0], dtype), stage, nsteps, term_cost
        )

    return problem_of_theta


CFG = solvers.ProxDDPConfig(tol=1e-11, mu_init=1e-4, max_iters=40)


def _value(pf, th):
    return float(solvers.solve(pf(th), CFG).traj_cost)


def test_th_grad_matches_fd_unconstrained():
    pf = problem_of_theta_factory()
    th0 = jnp.array([0.3, -0.2])
    res = solvers.solve_with_sensitivities(pf, th0, CFG)
    assert bool(res.conv)
    eps = 1e-5
    for j in range(2):
        e = jnp.zeros(2).at[j].set(eps)
        fd = (_value(pf, th0 + e) - _value(pf, th0 - e)) / (2 * eps)
        assert abs(float(res.th_grad[j]) - fd) < 5e-5 * max(1.0, abs(fd))


def test_th_hess_matches_fd_of_grad():
    pf = problem_of_theta_factory()
    th0 = jnp.array([0.3, -0.2])
    res = solvers.solve_with_sensitivities(pf, th0, CFG)
    eps = 1e-4
    H_fd = []
    for j in range(2):
        e = jnp.zeros(2).at[j].set(eps)
        gp = solvers.solve_with_sensitivities(pf, th0 + e, CFG).th_grad
        gm = solvers.solve_with_sensitivities(pf, th0 - e, CFG).th_grad
        H_fd.append((gp - gm) / (2 * eps))
    H_fd = jnp.stack(H_fd, axis=1)
    assert float(jnp.abs(res.th_hess - res.th_hess.T).max()) < 1e-8
    assert float(jnp.abs(res.th_hess - H_fd).max()) < 1e-4 * (
        1.0 + float(jnp.abs(H_fd).max())
    )


def test_th_grad_constrained_active_box():
    """With an active control box the envelope gradient must still match
    FD of the converged value (multiplier terms carry the sensitivity)."""
    pf = problem_of_theta_factory(u_bound=0.12)
    th0 = jnp.array([0.5, 0.0])
    cfg = solvers.ProxDDPConfig(tol=1e-8, mu_init=1e-2, max_iters=300)
    res = solvers.solve_with_sensitivities(pf, th0, cfg)
    assert bool(res.conv)
    assert float(jnp.max(jnp.abs(res.us))) > 0.119  # bound genuinely active

    def value(th):
        return float(solvers.solve(pf(th), cfg).traj_cost)

    eps = 1e-5
    for j in range(2):
        e = jnp.zeros(2).at[j].set(eps)
        fd = (value(th0 + e) - value(th0 - e)) / (2 * eps)
        assert abs(float(res.th_grad[j]) - fd) < 1e-3 * max(1.0, abs(fd))


def test_sensitivities_jit_vmap():
    """The sensitivity path is jit/vmap-compatible (batched MPC model)."""
    pf = problem_of_theta_factory(nsteps=10)

    @jax.jit
    def harvest(thetas):
        def one(th):
            r = solvers.solve_with_sensitivities(pf, th, CFG)
            return r.th_grad, r.th_hess

        return jax.vmap(one)(thetas)

    thetas = jnp.stack([jnp.array([0.3, -0.2]), jnp.array([-0.1, 0.4])])
    g, H = harvest(thetas)
    assert g.shape == (2, 2) and H.shape == (2, 2, 2)
    r0 = solvers.solve_with_sensitivities(pf, thetas[0], CFG)
    assert float(jnp.abs(g[0] - r0.th_grad).max()) < 1e-9
