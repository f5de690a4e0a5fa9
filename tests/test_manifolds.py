"""Manifold tests (counterpart of reference ``tests/manifolds.cpp`` and
``tests/python/test_manifolds.py``): group-op consistency, Jacobian checks
against finite differences, smoothness at the ω→0 singularity."""

import jax
import jax.numpy as jnp
import pytest

from aligator_tpu.core import CartesianProduct, TangentBundle, VectorSpace
from aligator_tpu.modelling import SE2, SE3, SO2, SO3

SPACES = [
    VectorSpace(4),
    SO2(),
    SE2(),
    SO3(),
    SE3(),
    CartesianProduct(SE2(), VectorSpace(3)),
    CartesianProduct(SE3(), VectorSpace(6)),
    TangentBundle(SE2()),
    TangentBundle(SE3()),
]


@pytest.mark.parametrize("space", SPACES, ids=lambda s: repr(s))
def test_integrate_difference_roundtrip(space):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = space.rand(k1)
    v = 0.5 * jax.random.normal(k2, (space.ndx,))
    x1 = space.integrate(x, v)
    v_back = space.difference(x, x1)
    assert jnp.allclose(v, v_back, atol=1e-10)
    # difference(x, x) == 0
    assert jnp.allclose(space.difference(x, x), 0.0, atol=1e-12)


@pytest.mark.parametrize("space", SPACES, ids=lambda s: repr(s))
def test_jacobians_vs_fd(space):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = space.rand(k1)
    x1 = space.rand(k2)
    eps = 1e-6

    for arg in (0, 1):
        J = space.jdifference(x0, x1, arg)
        Jfd = jnp.zeros_like(J)
        for i in range(space.ndx):
            dv = jnp.zeros(space.ndx).at[i].set(eps)
            if arg == 0:
                dp = space.difference(space.integrate(x0, dv), x1)
                dm = space.difference(space.integrate(x0, -dv), x1)
            else:
                dp = space.difference(x0, space.integrate(x1, dv))
                dm = space.difference(x0, space.integrate(x1, -dv))
            Jfd = Jfd.at[:, i].set((dp - dm) / (2 * eps))
        assert jnp.allclose(J, Jfd, atol=1e-5), f"jdifference arg={arg}"


def test_se2_exp_log_specials():
    space = SE2()
    # pure translation
    v = jnp.array([1.0, 2.0, 0.0])
    x = space.integrate(space.neutral(), v)
    assert jnp.allclose(x, jnp.array([1.0, 2.0, 1.0, 0.0]), atol=1e-12)
    # pure rotation
    v = jnp.array([0.0, 0.0, 0.5])
    x = space.integrate(space.neutral(), v)
    assert jnp.allclose(x[2:], jnp.array([jnp.cos(0.5), jnp.sin(0.5)]), atol=1e-12)
    # quarter-turn screw: exp([1,0,pi/2]) lands at (2/pi)*(1,1)
    v = jnp.array([1.0, 0.0, jnp.pi / 2])
    x = space.integrate(space.neutral(), v)
    assert jnp.allclose(x[:2], jnp.array([2 / jnp.pi, 2 / jnp.pi]), atol=1e-10)


def test_se2_smooth_at_zero_rotation():
    """Autodiff through ω = 0 must not produce NaNs (Taylor guards)."""
    space = SE2()
    x = space.rand(jax.random.PRNGKey(3))

    J = jax.jacfwd(lambda v: space.integrate(x, v))(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(J)))
    Jd = space.jdifference(x, x, 1)
    assert bool(jnp.all(jnp.isfinite(Jd)))
    assert jnp.allclose(Jd, jnp.eye(3), atol=1e-8)


def test_interpolate():
    space = SE2()
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x0, x1 = space.rand(k1), space.rand(k2)
    assert jnp.allclose(space.interpolate(x0, x1, 0.0), x0, atol=1e-12)
    assert jnp.allclose(space.interpolate(x0, x1, 1.0), x1, atol=1e-10)


def test_cartesian_product_ops():
    space = CartesianProduct(SE2(), VectorSpace(2))
    assert space.nx == 6 and space.ndx == 5
    k = jax.random.PRNGKey(7)
    x = space.rand(k)
    v = jnp.arange(5.0) * 0.1
    x1 = space.integrate(x, v)
    assert jnp.allclose(space.difference(x, x1), v, atol=1e-10)
