"""Batch-on-lanes Pallas SPD solver (round-4 VERDICT item 4).

Interpret-mode correctness on CPU (the hardware path is measured by
``/tmp``-style spikes and ``bench.py``'s humanoid metric; round-4 measured
1.84x on the nx=36 medium-dim sweep at batch 1024), plus the dispatch
fallback identity: off-TPU the custom-vmap rule must reproduce the XLA
path bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu.gar import riccati, smallmat
from aligator_tpu.gar.pallas_spd import spd_solve_lanes


@pytest.mark.parametrize("n,r", [(12, 37), (36, 37), (56, 57)])
def test_kernel_interpret_mode(n, r):
    rng = np.random.default_rng(0)
    B = 128
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    A = G @ np.transpose(G, (0, 2, 1)) + n * np.eye(n, dtype=np.float32)
    R = rng.normal(size=(B, n, r)).astype(np.float32)
    X = spd_solve_lanes(jnp.asarray(A), jnp.asarray(R), interpret=True)
    ref = np.linalg.solve(A.astype(np.float64), R.astype(np.float64))
    assert np.abs(np.asarray(X, np.float64) - ref).max() < 1e-6


@pytest.mark.parametrize("axis_size", [16, 130])
def test_padded_solve_interpret_mode(axis_size):
    """The identity-padding branch (batches not a multiple of 128) in
    interpret mode must match the per-system XLA solve — exercises the
    pad-concatenate-slice logic off-hardware (round-4 ADVICE)."""
    rng = np.random.default_rng(2)
    n, r = 16, 5
    G = rng.normal(size=(axis_size, n, n)).astype(np.float32)
    A = jnp.asarray(G @ np.transpose(G, (0, 2, 1)) + n * np.eye(n, dtype=np.float32))
    R = jnp.asarray(rng.normal(size=(axis_size, n, r)).astype(np.float32))
    X = riccati.spd_solve_lanes_padded(A, R, interpret=True)
    assert X.shape == (axis_size, n, r)
    ref = jax.vmap(smallmat.solve_spd)(A, R)
    assert float(jnp.abs(X - ref).max()) < 1e-4


def test_lanes_eligibility_thresholds():
    """Static gate: tiny live batches and over-VMEM tiles stay on XLA
    (round-4 ADVICE: only batch >= 16 was measured as a win)."""
    ok = lambda b, n, r: riccati.spd_lanes_eligible(  # noqa: E731
        b, n, r, jnp.float32, backend="tpu"
    )
    assert ok(16, 36, 37)
    assert ok(128, 56, 57)  # Talos-dim scratch-free tile
    assert not ok(2, 36, 37)  # live batch below the measured-win floor
    assert not ok(128, 90, 91)  # over the ~12 MB scoped-VMEM cap
    assert not riccati.spd_lanes_eligible(
        128, 36, 37, jnp.float64, backend="tpu"
    )
    assert not riccati.spd_lanes_eligible(
        128, 36, 37, jnp.float32, backend="cpu"
    )


def test_dispatch_fallback_identity():
    """On CPU the dispatch is ineligible and must equal smallmat exactly,
    both under vmap and unbatched."""
    rng = np.random.default_rng(1)
    B, n, rr = 64, 36, 10
    G = rng.normal(size=(B, n, n)).astype(np.float64)
    A = jnp.asarray(G @ np.transpose(G, (0, 2, 1)) + n * np.eye(n))
    R = jnp.asarray(rng.normal(size=(B, n, rr)))
    a = jax.vmap(riccati._spd_solve_dispatch)(A, R)
    b = jax.vmap(smallmat.solve_spd)(A, R)
    assert float(jnp.abs(a - b).max()) == 0.0
    c = riccati._spd_solve_dispatch(A[0], R[0])
    assert float(jnp.abs(c - b[0]).max()) == 0.0


def test_spd_lanes_backward_identical_on_cpu():
    """spd_lanes=True must be numerically identical off-TPU (pure
    dispatch; the flag only changes the batched TPU route)."""
    from aligator_tpu import gar

    prob = gar.random_convex_problem(
        jax.random.PRNGKey(0), 16, 36, 12, 6, dtype=jnp.float32
    )
    f0 = riccati.backward(prob, 1e-3, 1e-3, True)
    f1 = riccati.backward(prob, 1e-3, 1e-3, True, spd_lanes=True)
    for a, b in zip(jax.tree.leaves(f0), jax.tree.leaves(f1)):
        assert float(jnp.abs(a - b).max()) == 0.0
