"""Integrator order checks (counterpart of reference
``tests/python/test_integrators.py``)."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu._pytree import pytree_dataclass
from aligator_tpu.core import TangentBundle, VectorSpace
from aligator_tpu.modelling import (
    IntegratorEuler,
    IntegratorRK2,
    IntegratorRK4,
    IntegratorSemiImplEuler,
    LinearODE,
    ODE,
)


@pytree_dataclass
class DecayODE(ODE):
    def xdot(self, space, x, u):
        return -x


def exact(x0, t):
    return x0 * jnp.exp(-t)


def rollout(integ, space, x0, u, steps):
    def body(x, _):
        xn = integ.forward(space, x, u)
        return xn, None

    xf, _ = jax.lax.scan(body, x0, None, length=steps)
    return xf


@pytest.mark.parametrize(
    "cls,order",
    [(IntegratorEuler, 1), (IntegratorRK2, 2), (IntegratorRK4, 4)],
)
def test_integrator_order(cls, order):
    space = VectorSpace(2)
    x0 = jnp.array([1.0, -0.5])
    u = jnp.zeros(1)
    T = 1.0
    errs = []
    for steps in (20, 40):
        h = T / steps
        integ = cls(ode=DecayODE(), timestep=jnp.asarray(h))
        xf = rollout(integ, space, x0, u, steps)
        errs.append(float(jnp.max(jnp.abs(xf - exact(x0, T)))))
    rate = jnp.log2(errs[0] / errs[1])
    assert rate > order - 0.3, f"observed order {rate}, expected {order}"


@pytree_dataclass
class OscillatorODE(ODE):
    """q̈ = -q: xdot = (v, -q) on a tangent bundle."""

    def xdot(self, space, x, u):
        q, v = x[..., :1], x[..., 1:]
        return jnp.concatenate([v, -q], -1)


def test_semi_implicit_euler_energy():
    """Symplectic Euler approximately conserves the oscillator energy."""
    space = TangentBundle(VectorSpace(1))
    h = 0.01
    integ = IntegratorSemiImplEuler(ode=OscillatorODE(), timestep=jnp.asarray(h))
    x0 = jnp.array([1.0, 0.0])
    xf = rollout(integ, space, x0, jnp.zeros(1), 2000)  # 20 seconds
    E0 = 0.5 * (x0[0] ** 2 + x0[1] ** 2)
    Ef = 0.5 * (xf[0] ** 2 + xf[1] ** 2)
    assert abs(float(Ef - E0)) < 0.02  # bounded energy error, no drift


def test_linear_ode_euler_matches_closed_form():
    space = VectorSpace(2)
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    B = jnp.array([[0.0], [1.0]])
    ode = LinearODE(A=A, B=B, c=jnp.zeros(2))
    h = 0.1
    integ = IntegratorEuler(ode=ode, timestep=jnp.asarray(h))
    x = jnp.array([1.0, 2.0])
    u = jnp.array([3.0])
    got = integ.forward(space, x, u)
    want = x + h * (A @ x + B @ u)
    assert jnp.allclose(got, want, atol=1e-14)


def test_implicit_midpoint_symplectic():
    from aligator_tpu.modelling import IntegratorMidpoint

    space = TangentBundle(VectorSpace(1))
    integ = IntegratorMidpoint(ode=OscillatorODE(), timestep=jnp.asarray(0.05))
    x0 = jnp.array([1.0, 0.0])
    xf = rollout(integ, space, x0, jnp.zeros(1), 2000)
    E0 = 0.5
    Ef = 0.5 * (xf[0] ** 2 + xf[1] ** 2)
    # implicit midpoint conserves quadratic invariants exactly
    assert abs(float(Ef - E0)) < 1e-12
    # the Newton solve drives the residual to machine precision
    y = integ.forward(space, x0, jnp.zeros(1))
    assert float(jnp.abs(integ.residual(space, x0, jnp.zeros(1), y)).max()) < 1e-12


def test_proxddp_with_implicit_midpoint():
    """End-to-end: ProxDDP (nonlinear rollout) over implicit-midpoint
    dynamics."""
    from aligator_tpu import core, solvers
    from aligator_tpu.modelling import IntegratorMidpoint

    space = VectorSpace(2)
    A = jnp.array([[0.0, 1.0], [-1.0, -0.1]])
    B = jnp.array([[0.0], [1.0]])
    ode = LinearODE(A=A, B=B, c=jnp.zeros(2))
    dyn = IntegratorMidpoint(ode=ode, timestep=jnp.asarray(0.1))
    cost = core.QuadraticCost.create(0.1 * jnp.eye(2), 0.01 * jnp.eye(1))
    term = core.QuadraticCost.create(10.0 * jnp.eye(2), jnp.zeros((1, 1)))
    stage = core.make_stage(cost, dyn, space, 1)
    problem = core.make_problem(jnp.array([1.0, 0.0]), stage, 20, term)
    res = solvers.solve(
        problem,
        solvers.ProxDDPConfig(tol=1e-6, max_iters=40, rollout="nonlinear"),
    )
    assert bool(res.conv)
    assert float(res.prim_infeas) < 1e-6
