"""Rollout utilities (reference ``include/aligator/utils/rollout.hpp:8-60``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def rollout(dynamics, space, x0, us, stage_params=None):
    """Open-loop rollout of explicit dynamics: returns xs (N+1, nx).

    ``dynamics`` may be a single ExplicitDynamics (applied at every stage) or
    a stacked pytree with leading time axis (heterogeneous stages).
    """
    del stage_params  # reserved
    if _leading_axis_matches(dynamics, us.shape[0]):
        def body(x, inp):
            dyn_t, u = inp
            xn = dyn_t.forward(space, x, u)
            return xn, xn

        _, xs = lax.scan(body, x0, (dynamics, us))
    else:
        def body(x, u):
            xn = dynamics.forward(space, x, u)
            return xn, xn

        _, xs = lax.scan(body, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def _leading_axis_matches(tree, n):
    leaves = jax.tree.leaves(tree)
    return bool(leaves) and all(
        hasattr(l, "shape") and l.ndim >= 1 and l.shape[0] == n for l in leaves
    )


def closed_loop_rollout(dynamics, space, x0, us_ref, xs_ref, K, kff=None):
    """Feedback rollout: u = u_ref + kff + K·(x ⊖ x_ref). Returns (xs, us)."""

    def body(x, inp):
        u_ref, x_ref, K_t, k_t = inp
        dx = space.difference(x_ref, x)
        u = u_ref + K_t @ dx + (k_t if k_t is not None else 0.0)
        xn = dynamics.forward(space, x, u)
        return xn, (xn, u)

    if kff is None:
        kff = jnp.zeros_like(us_ref)
    _, (xs, us) = lax.scan(body, x0, (us_ref, xs_ref[:-1], K, kff))
    return jnp.concatenate([x0[None], xs], axis=0), us
