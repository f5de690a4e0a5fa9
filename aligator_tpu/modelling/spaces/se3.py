"""SO(3) and SE(3) Lie groups (quaternion representation).

Counterpart of the pinocchio Lie groups the reference wraps
(``modelling/spaces/pinocchio-groups.hpp:22``) — the building blocks of
floating-base multibody configuration spaces.

Conventions follow pinocchio:
  SO(3): x = quaternion (qx, qy, qz, qw); tangent = ω (body frame);
         integrate(q, ω) = q ⊗ exp₃(ω); difference = log₃(q₀⁻¹ q₁).
  SE(3): x = (px, py, pz, qx, qy, qz, qw); tangent = (v, ω) body twist;
         integrate = x · exp₆(v, ω); difference = log₆(x₀⁻¹ x₁).

All maps use Taylor-guarded forms smooth at the identity for autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.manifolds import Manifold

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternion utilities (x, y, z, w)
# ---------------------------------------------------------------------------


def quat_mul(q1, q2):
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (R(q) @ v)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_matrix(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def exp3_quat(w):
    """exp: so(3) → unit quaternion, Taylor-safe."""
    t2 = jnp.sum(w * w, -1, keepdims=True)
    t = jnp.sqrt(jnp.maximum(t2, _EPS**2))
    small = t2 < _EPS
    # sin(t/2)/t and cos(t/2)
    s = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * t) / t)
    c = jnp.where(
        small[..., 0], 1.0 - t2[..., 0] / 8.0, jnp.cos(0.5 * t[..., 0])
    )
    return jnp.concatenate([s * w, c[..., None]], axis=-1)


def log3(q):
    """log: unit quaternion → so(3), Taylor-safe, range (-π, π]."""
    u = q[..., :3]
    w = q[..., 3]
    # enforce shortest path (double cover)
    sgn = jnp.where(w < 0.0, -1.0, 1.0)
    u = u * sgn[..., None]
    w = w * sgn
    un2 = jnp.sum(u * u, -1)
    un = jnp.sqrt(jnp.maximum(un2, _EPS**2))
    angle = 2.0 * jnp.arctan2(un, w)
    small = un2 < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5) , angle / un)
    return u * scale[..., None]


def _hat(w):
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        axis=-2,
    )


def so3_jac_terms(w):
    """Coefficients for V(w) = I + a·ŵ + b·ŵ² (SE(3) exp translation map)
    with a = (1−cos t)/t², b = (t − sin t)/t³, Taylor-safe."""
    t2 = jnp.sum(w * w, -1)
    t = jnp.sqrt(jnp.maximum(t2, _EPS**2))
    small = t2 < _EPS
    a = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.maximum(t2, _EPS**2))
    b = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / jnp.maximum(t2 * t, _EPS**3)
    )
    return a, b


def se3_exp(v, w):
    """exp₆: twist (v, ω) → (translation p, quaternion q)."""
    q = exp3_quat(w)
    a, b = so3_jac_terms(w)
    W = _hat(w)
    p = v + a[..., None] * (W @ v[..., None])[..., 0] + b[..., None] * (
        W @ (W @ v[..., None])
    )[..., 0]
    return p, q


def se3_log(p, q):
    """log₆: (p, q) → twist (v, ω)."""
    w = log3(q)
    a, b = so3_jac_terms(w)
    W = _hat(w)
    t2 = jnp.sum(w * w, -1)
    # V^{-1} = I - 1/2 ŵ + c ŵ², c = (1/t²)(1 - a/(2b́))… use standard form:
    # c = (1 − a/(2·(a²+…)))… simpler closed form:
    # V^{-1} = I − ŵ/2 + (1/t² − a/(2b̃)) ŵ² with b̃ = sin t / t … use:
    t = jnp.sqrt(jnp.maximum(t2, _EPS**2))
    small = t2 < _EPS
    # coefficient: (1 - (t/2)·cot(t/2)) / t²
    half = 0.5 * t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(t2, _EPS**2),
    )
    v = (
        p
        - 0.5 * (W @ p[..., None])[..., 0]
        + cot_term[..., None] * (W @ (W @ p[..., None]))[..., 0]
    )
    return v, w


class SO3(Manifold):
    """3D rotations, quaternion chart."""

    nx = 4
    ndx = 3

    def neutral(self):
        return jnp.array([0.0, 0.0, 0.0, 1.0])

    def rand(self, key):
        q = jax.random.normal(key, (4,))
        return q / jnp.linalg.norm(q)

    def integrate(self, x, v):
        return quat_mul(x, exp3_quat(v))

    def difference(self, x0, x1):
        return log3(quat_mul(quat_conj(x0), x1))

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x * x, -1) - 1.0) < 1e-6

    def __eq__(self, other):
        return type(other) is SO3

    def __hash__(self):
        return hash("SO3")


class SE3(Manifold):
    """Rigid transformations, (p, quaternion) chart."""

    nx = 7
    ndx = 6

    def neutral(self):
        return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])

    def rand(self, key):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (3,))
        q = jax.random.normal(k2, (4,))
        return jnp.concatenate([p, q / jnp.linalg.norm(q)])

    def integrate(self, x, tangent):
        p0, q0 = x[..., :3], x[..., 3:]
        v, w = tangent[..., :3], tangent[..., 3:]
        dp, dq = se3_exp(v, w)
        p = p0 + quat_rotate(q0, dp)
        q = quat_mul(q0, dq)
        return jnp.concatenate([p, q], axis=-1)

    def difference(self, x0, x1):
        p0, q0 = x0[..., :3], x0[..., 3:]
        p1, q1 = x1[..., :3], x1[..., 3:]
        q01 = quat_mul(quat_conj(q0), q1)
        p01 = quat_rotate(quat_conj(q0), p1 - p0)
        v, w = se3_log(p01, q01)
        return jnp.concatenate([v, w], axis=-1)

    def is_normalized(self, x):
        return jnp.abs(jnp.sum(x[..., 3:] ** 2, -1) - 1.0) < 1e-6

    def __eq__(self, other):
        return type(other) is SE3

    def __hash__(self):
        return hash("SE3")
