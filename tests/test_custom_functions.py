"""User-defined costs/functions/dynamics (counterpart of reference
``tests/python/test_custom_pyfunctions.py``): in this framework users simply
subclass the pytree dataclasses — no binding layer — and everything (autodiff
Jacobians, vmap, jit, the solvers) composes."""

import jax
import jax.numpy as jnp

from aligator_tpu import core, solvers
from aligator_tpu._pytree import pytree_dataclass
from aligator_tpu.core.functions import StageFunction
from aligator_tpu.core.costs import Cost
from aligator_tpu.modelling import ODE, IntegratorEuler


@pytree_dataclass
class MyResidual(StageFunction):
    """Custom nonlinear residual with only `value` defined — Jacobians come
    from the autodiff default."""

    scale: jax.Array

    def value(self, space, x, u):
        return jnp.tanh(self.scale * x[:1]) + 0.1 * u


@pytree_dataclass
class MyCost(Cost):
    w: jax.Array

    def value(self, space, x, u):
        return self.w * (jnp.sum(jnp.cos(x)) + 0.5 * jnp.sum(u**2))


@pytree_dataclass
class MyODE(ODE):
    k: jax.Array

    def xdot(self, space, x, u):
        return jnp.stack([x[1], -self.k * jnp.sin(x[0]) + u[0]])


def test_custom_residual_autodiff_jacobians():
    space = core.VectorSpace(2)
    f = MyResidual(scale=jnp.asarray(2.0))
    x = jnp.array([0.3, -0.1])
    u = jnp.array([0.5])
    Jx, Ju = f.jacobians(space, x, u)
    # d tanh(2x)/dx = 2 sech²(2x)
    expect = 2.0 / jnp.cosh(2 * 0.3) ** 2
    assert jnp.allclose(Jx[0, 0], expect, atol=1e-10)
    assert jnp.allclose(Ju, 0.1 * jnp.eye(1), atol=1e-12)


def test_solver_with_fully_custom_problem():
    space = core.VectorSpace(2)
    dyn = IntegratorEuler(ode=MyODE(k=jnp.asarray(3.0)), timestep=jnp.asarray(0.05))
    cost = MyCost(w=jnp.asarray(0.1))
    term = core.QuadraticStateCost(jnp.array([jnp.pi, 0.0]), 10 * jnp.eye(2))
    constraints = (
        (MyResidual(scale=jnp.asarray(1.0)), core.NegativeOrthant()),
    )
    stage = core.make_stage(cost, dyn, space, 1, constraints)
    problem = core.make_problem(jnp.zeros(2), stage, 30, term)
    res = solvers.solve(
        problem, solvers.ProxDDPConfig(tol=1e-4, max_iters=100, rollout="nonlinear")
    )
    assert bool(jnp.isfinite(res.traj_cost))
    # constraint satisfied to AL tolerance
    v = jax.vmap(
        lambda x, u: MyResidual(scale=jnp.asarray(1.0)).value(space, x, u)
    )(res.xs[:-1], res.us)
    assert float(v.max()) < 1e-3
