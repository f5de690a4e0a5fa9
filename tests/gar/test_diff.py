"""Implicit-diff gradients through the LQ solve vs finite differences."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu import gar
from aligator_tpu._pytree import replace
from aligator_tpu.gar import diff

MUDYN = 1e-3
MUEQ = 1e-3


def make_prob():
    return gar.random_problem(jax.random.PRNGKey(2), 8, 3, 2, 1, dtype=jnp.float64)


def loss_of(problem):
    xs, us, vs, lams = diff.solve(problem, MUDYN, MUEQ, True)
    return jnp.sum(us**2) + jnp.sum(xs[-1] ** 2) + jnp.sum(vs**2)


def loss_ref(problem):
    xs, us, vs, lams = gar.solve(problem, MUDYN, MUEQ, assume_explicit=True)
    return jnp.sum(us**2) + jnp.sum(xs[-1] ** 2) + jnp.sum(vs**2)


@pytest.mark.parametrize(
    "field,idx",
    [
        ("q", (3, 1)),
        ("r", (2, 0)),
        ("f", (4, 2)),
        ("d", (5, 0)),
        ("Q", (3, 1, 2)),
        ("R", (2, 0, 1)),
        ("S", (1, 2, 1)),
        ("A", (4, 0, 2)),
        ("B", (3, 1, 1)),
        ("C", (2, 0, 2)),
        ("D", (6, 0, 1)),
    ],
)
def test_grad_vs_fd(field, idx):
    prob = make_prob()
    g = jax.grad(loss_of)(prob)
    g_field = getattr(g.knots, field)[idx]

    eps = 1e-6
    arr = getattr(prob.knots, field)
    prob_p = replace(prob, knots=replace(prob.knots, **{field: arr.at[idx].add(eps)}))
    prob_m = replace(prob, knots=replace(prob.knots, **{field: arr.at[idx].add(-eps)}))
    fd = (loss_ref(prob_p) - loss_ref(prob_m)) / (2 * eps)
    assert jnp.allclose(g_field, fd, rtol=1e-4, atol=1e-7), (
        field, float(g_field), float(fd)
    )


def test_grad_g0():
    prob = make_prob()
    g = jax.grad(loss_of)(prob)
    eps = 1e-6
    for i in range(2):
        pp = replace(prob, g0=prob.g0.at[i].add(eps))
        pm = replace(prob, g0=prob.g0.at[i].add(-eps))
        fd = (loss_ref(pp) - loss_ref(pm)) / (2 * eps)
        assert jnp.allclose(g.g0[i], fd, rtol=1e-4, atol=1e-7)


def test_value_matches_plain_solve():
    prob = make_prob()
    assert jnp.allclose(loss_of(prob), loss_ref(prob), atol=1e-12)


def test_inverse_lqr_learning():
    """Inverse optimal control through the differentiable solve: gradient
    descent on cost weights reproduces expert demonstrations (loss drops
    by >4 orders of magnitude)."""
    import optax

    from examples.inverse_lqr import (
        make_problem_template,
        solve_traj,
    )

    template = make_problem_template(N=25)
    x0s = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    log_wq_true = jnp.log(jnp.asarray([3.0, 0.5, 0.1, 2.0]))
    log_wr_true = jnp.log(jnp.asarray([0.3, 1.5]))
    xs_e, us_e = jax.vmap(
        lambda x0: solve_traj(template, log_wq_true, log_wr_true, x0)
    )(x0s)

    def loss(params):
        xs, us = jax.vmap(
            lambda x0: solve_traj(template, params["q"], params["r"], x0)
        )(x0s)
        return jnp.mean((xs - xs_e) ** 2) + jnp.mean((us - us_e) ** 2)

    params = {"q": jnp.zeros(4), "r": jnp.zeros(2)}
    opt = optax.adam(0.1)
    state = opt.init(params)
    lg = jax.jit(jax.value_and_grad(loss))
    l0 = float(loss(params))
    for _ in range(150):
        _, g = lg(params)
        updates, state = opt.update(g, state)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    lf = float(loss(params))
    assert lf < 1e-4 * l0, (l0, lf)
