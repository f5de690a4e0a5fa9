"""Partial / general initial-condition constraints.

Reference: ``TrajOptProblemTpl``'s init condition is an arbitrary
StageFunction (``core/traj-opt-problem.hpp:78``); the canonical use is
``examples/partial_initial_condition.py`` — pin only one state component via
a FunctionSlice of a StateErrorResidual with
``solver.force_initial_condition = False``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import core, solvers
from aligator_tpu._pytree import replace


def _make_problem(init_constraint=None, x0=(0.3, 0.1), nsteps=40):
    space = core.VectorSpace(2)
    A = jnp.eye(2).at[0, 1].set(0.1)
    B = jnp.eye(2)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((2,)))
    cost = core.QuadraticCost.create(1e-2 * jnp.eye(2), 1e-3 * jnp.eye(2))
    term_cost = core.QuadraticCost.create(jnp.eye(2), jnp.zeros((2, 2)))
    stage = core.make_stage(cost, dyn, space, 2)
    return core.make_problem(
        jnp.asarray(x0),
        stage,
        nsteps,
        term_cost,
        init_constraint=init_constraint,
    )


CFG = solvers.ProxDDPConfig(
    tol=1e-6,
    mu_init=1e-2,
    max_iters=30,
    max_al_iters=10,
    rollout="linear",
    force_initial_condition=False,
)


def test_partial_initial_condition():
    target = jnp.asarray([0.3, 0.1])
    init = core.FunctionSlice(
        func=core.StateErrorResidual(target=target), indices=(1,)
    )
    problem = _make_problem(init_constraint=init)
    res = solvers.solve(problem, CFG)
    assert bool(res.conv)
    # the pinned component meets the constraint; the free one moves off 0.3
    np.testing.assert_allclose(float(res.xs[0, 1]), 0.1, atol=1e-5)

    # optimality of the free component: re-solving with the FULL initial
    # state pinned at the partial solve's x0 reproduces the same optimum…
    full = _make_problem(x0=np.asarray(res.xs[0]))
    cfg_full = replace(CFG, force_initial_condition=True)
    res_full = solvers.solve(full, cfg_full)
    np.testing.assert_allclose(
        np.asarray(res_full.us), np.asarray(res.us), atol=1e-4
    )
    # …and pinning the free component anywhere else costs more.
    for dx in (-0.05, 0.05):
        x0p = np.asarray(res.xs[0]) + np.asarray([dx, 0.0])
        res_p = solvers.solve(_make_problem(x0=x0p), cfg_full)
        assert float(res_p.traj_cost) > float(res.traj_cost) - 1e-8

    # padded multiplier row (the inactive μ-regularized slot) stays zero
    np.testing.assert_allclose(float(res.lams[0, 1]), 0.0, atol=1e-12)


def test_init_constraint_rejects_forced_x0():
    init = core.FunctionSlice(
        func=core.StateErrorResidual(target=jnp.zeros((2,))), indices=(0,)
    )
    problem = _make_problem(init_constraint=init)
    with pytest.raises(ValueError, match="force_initial_condition"):
        solvers.solve(problem, replace(CFG, force_initial_condition=True))
