"""Matmul-precision policy.

TPU matmuls default to bf16 passes. Two tiers are used here (measured on
v5e, random-Wishart LQ batch, fp32):

* ``high`` (3-pass bf16) — problem evaluation, rollouts, multiplier
  updates: convergence statistics are identical to fp64 and it is ~2×
  faster than ``highest``.
* ``highest`` (fp32 passes) — the gar numeric core (Riccati recursions,
  condensed/parallel solves, contact KKTs): μ-scaled KKT blocks lose SPD
  under bf16 rounding (23% of solves go non-finite at default precision;
  KKT residuals are 100× worse at ``high`` than ``highest``).

The package sets the global default to ``high`` (see ``__init__``);
functions in the numeric core pin ``highest`` via :func:`highest_precision`.
The fused Pallas kernel is unaffected either way (scalar VPU arithmetic).
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Trace ``fn`` with full-fp32 matmul passes regardless of the global
    default (the ops record the precision at trace time)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
