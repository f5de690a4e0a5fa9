"""SO(2) and SE(2) Lie groups.

Counterpart of the pinocchio Lie-group wrappers used by the reference
(``modelling/spaces/pinocchio-groups.hpp:112`` — ``SETpl<2>`` is the state
space of the SE(2)-car benchmark, ``examples/se2-car.hpp:15``).

Representations follow pinocchio:
  SO(2): x = (cosθ, sinθ), tangent = ω
  SE(2): x = (px, py, cosθ, sinθ), tangent = (vx, vy, ω) — *body* twist,
  integrate = right-translated exp map: p⁺ = p + R(θ)·V(ω)·v, θ⁺ = θ + ω.

All trigonometric ratios (sinω/ω etc.) use Taylor-guarded forms so the maps
are smooth at ω = 0 under forward-mode autodiff (no NaN gradients from the
`where` branches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.manifolds import Manifold

_EPS = 1e-6


def _sinc(w):
    """sin(w)/w, smooth at 0."""
    w2 = w * w
    safe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    return jnp.where(jnp.abs(w) < _EPS, 1.0 - w2 / 6.0, jnp.sin(safe) / safe)


def _cosc(w):
    """(1 - cos(w))/w, smooth at 0."""
    w2 = w * w
    safe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    return jnp.where(
        jnp.abs(w) < _EPS, w / 2.0 - w * w2 / 24.0, (1.0 - jnp.cos(safe)) / safe
    )


class SO2(Manifold):
    """Unit circle; x = (cosθ, sinθ)."""

    nx = 2
    ndx = 1

    def neutral(self):
        return jnp.array([1.0, 0.0])

    def rand(self, key):
        th = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
        return jnp.array([jnp.cos(th), jnp.sin(th)])

    def integrate(self, x, v):
        c, s = x[..., 0], x[..., 1]
        w = v[..., 0]
        cw, sw = jnp.cos(w), jnp.sin(w)
        return jnp.stack([c * cw - s * sw, s * cw + c * sw], axis=-1)

    def difference(self, x0, x1):
        c0, s0 = x0[..., 0], x0[..., 1]
        c1, s1 = x1[..., 0], x1[..., 1]
        # angle of R0^T R1
        return jnp.arctan2(s1 * c0 - c1 * s0, c1 * c0 + s1 * s0)[..., None]

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x**2, -1) - 1.0) < 1e-6

    def __eq__(self, other):
        return type(other) is SO2

    def __hash__(self):
        return hash("SO2")


class SE2(Manifold):
    """Planar rigid transformations; x = (px, py, cosθ, sinθ)."""

    nx = 4
    ndx = 3

    def neutral(self):
        return jnp.array([0.0, 0.0, 1.0, 0.0])

    def rand(self, key):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (2,))
        th = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        return jnp.concatenate([p, jnp.array([jnp.cos(th), jnp.sin(th)])])

    @staticmethod
    def from_xytheta(x, y, theta):
        return jnp.array([x, y, jnp.cos(theta), jnp.sin(theta)])

    def integrate(self, x, v):
        p = x[..., :2]
        c, s = x[..., 2], x[..., 3]
        vx, vy, w = v[..., 0], v[..., 1], v[..., 2]
        a = _sinc(w)  # sin w / w
        b = _cosc(w)  # (1 - cos w)/w
        # exp-map translation in the body frame: V(w) @ (vx, vy)
        tx = a * vx - b * vy
        ty = b * vx + a * vy
        # rotate into world frame and translate
        px = p[..., 0] + c * tx - s * ty
        py = p[..., 1] + s * tx + c * ty
        cw, sw = jnp.cos(w), jnp.sin(w)
        cn = c * cw - s * sw
        sn = s * cw + c * sw
        return jnp.stack([px, py, cn, sn], axis=-1)

    def difference(self, x0, x1):
        # relative transform m = x0^{-1} x1, then log(m)
        c0, s0 = x0[..., 2], x0[..., 3]
        dp = x1[..., :2] - x0[..., :2]
        # R0^T dp
        rx = c0 * dp[..., 0] + s0 * dp[..., 1]
        ry = -s0 * dp[..., 0] + c0 * dp[..., 1]
        c1, s1 = x1[..., 2], x1[..., 3]
        w = jnp.arctan2(s1 * c0 - c1 * s0, c1 * c0 + s1 * s0)
        a = _sinc(w)
        b = _cosc(w)
        den = a * a + b * b
        # V(w)^{-1} @ (rx, ry)
        vx = (a * rx + b * ry) / den
        vy = (-b * rx + a * ry) / den
        return jnp.stack([vx, vy, w], axis=-1)

    def is_normalized(self, x):
        return jnp.abs(x[..., 2] ** 2 + x[..., 3] ** 2 - 1.0) < 1e-6

    def __eq__(self, other):
        return type(other) is SE2

    def __hash__(self):
        return hash("SE2")
