"""Fused whole-stage batch-on-lanes kernel vs the XLA scan sweep.

Same cross-validation design as the reference's gar tests (tests/gar/
riccati.cpp): the independently-implemented structured solver is checked
against another full implementation on random convex problems — here the
fused Pallas stage kernel (interpret mode, so the pad/transpose/slice
logic runs on CPU) against the ``lax.scan`` over ``_stage_kernel``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import gar
from aligator_tpu.gar import pallas_stage, riccati

MUDYN = 1e-2
MUEQ = 1e-2


def _batched_problem(B, N, nx, nu, nc, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    probs = jax.vmap(
        lambda k: gar.random_convex_problem(
            k, N, nx, nu, nc, dtype=jnp.float32
        )
    )(keys)
    return probs.knots


def _build_sweep_inputs(kn, N):
    def build(kk):
        term = riccati._terminal_solve(kk, N, MUEQ, 0)
        kf = dict(
            Q=kk.Q[:N], S=kk.S[:N], R=kk.R[:N], q=kk.q[:N], r=kk.r[:N],
            A=kk.A[:N], B=kk.B[:N], f=kk.f[:N],
            C=kk.C[:N], D=kk.D[:N], d=kk.d[:N],
        )
        return kf, dict(P=term["Pmat"], p=term["pvec"])

    return jax.vmap(build)(kn)


@pytest.mark.parametrize("dims", [(6, 13, 4, 3), (4, 16, 5, 0)])
def test_fused_sweep_matches_scan_interpret(dims):
    """Interpret-mode fused sweep == vmapped XLA scan (incl. the nc=0
    zero-padding branch, which must slice the dummy multiplier rows off)."""
    N, nx, nu, nc = dims
    B = 128
    kn = _batched_problem(B, N, nx, nu, nc)
    ref_carry, ref_stages = jax.vmap(
        lambda kk: riccati.sweep(kk, MUDYN, MUEQ, assume_explicit=True)
    )(kn)
    kf_b, c0_b = _build_sweep_inputs(kn, N)
    mu = jnp.full((B,), MUDYN, jnp.float32)
    me = jnp.full((B,), MUEQ, jnp.float32)
    carry_f, stages = pallas_stage.sweep_lanes(
        kf_b, c0_b, mu, me, interpret=True
    )
    for k in stages:
        a = np.asarray(ref_stages[k][:, :N])
        b = np.asarray(stages[k])
        assert a.shape == b.shape, k
        if a.size == 0:  # nc = 0: empty multiplier rows, shape check only
            continue
        scale = np.max(np.abs(a)) + 1e-9
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, err_msg=k)
    for k in ("P", "p"):
        a = np.asarray(ref_carry[k])
        np.testing.assert_allclose(
            np.asarray(carry_f[k]), a,
            atol=5e-4 * (np.max(np.abs(a)) + 1e-9), err_msg=k,
        )


def test_fused_dispatch_falls_back_on_cpu():
    """``sweep(stage_fused=True)`` under vmap must equal the plain scan on
    CPU (eligibility False → custom_vmap rule takes the vmapped-scan
    branch; validates the dispatch plumbing end to end)."""
    N, nx, nu, nc = 5, 13, 4, 2
    kn = _batched_problem(16, N, nx, nu, nc, seed=3)
    ref_c, ref_s = jax.vmap(
        lambda kk: riccati.sweep(kk, MUDYN, MUEQ, assume_explicit=True)
    )(kn)
    fus_c, fus_s = jax.vmap(
        lambda kk: riccati.sweep(
            kk, MUDYN, MUEQ, assume_explicit=True, stage_fused=True
        )
    )(kn)
    # not bit-exact: the explicit jax.vmap(scan) in the fallback branch
    # fuses differently than vmap-tracing the inline scan — fp32 roundoff
    for k in ref_s:
        a = np.asarray(ref_s[k])
        np.testing.assert_allclose(
            np.asarray(fus_s[k]), a,
            atol=5e-4 * (np.max(np.abs(a)) + 1e-9), err_msg=k,
        )
    a = np.asarray(ref_c["P"])
    np.testing.assert_allclose(
        np.asarray(fus_c["P"]), a, atol=5e-4 * (np.max(np.abs(a)) + 1e-9)
    )


def test_fused_stage_eligibility():
    f32 = jnp.float32
    # the humanoid bench shape is eligible on a TPU backend
    assert pallas_stage.fused_stage_eligible(
        1024, 36, 12, 12, f32, backend="tpu"
    )
    # nc = 0 (unconstrained) is eligible at medium dims
    assert pallas_stage.fused_stage_eligible(
        256, 36, 12, 0, f32, backend="tpu"
    )
    # the lqr56 shape is EXCLUDED: measured 0.86x on v5e (the per-lane
    # unrolled O(n^3) chains lose to XLA's batched GEMMs by nx=56)
    assert not pallas_stage.fused_stage_eligible(
        256, 56, 22, 0, f32, backend="tpu"
    )
    # not on CPU, not in fp64, not for tiny dims / ragged batches / θ
    assert not pallas_stage.fused_stage_eligible(
        1024, 36, 12, 12, f32, backend="cpu"
    )
    assert not pallas_stage.fused_stage_eligible(
        1024, 36, 12, 12, jnp.float64, backend="tpu"
    )
    assert not pallas_stage.fused_stage_eligible(
        1024, 8, 4, 2, f32, backend="tpu"
    )
    assert not pallas_stage.fused_stage_eligible(
        100, 36, 12, 12, f32, backend="tpu"
    )
    assert not pallas_stage.fused_stage_eligible(
        1024, 36, 12, 12, f32, nth=2, backend="tpu"
    )
    assert not pallas_stage.fused_stage_eligible(
        1024, 36, 12, 12, f32, assume_explicit=False, backend="tpu"
    )


@pytest.mark.parametrize("nc", [3, 0])
def test_forward_lanes_matches_scan_interpret(nc):
    """Interpret-mode lanes forward substitution == riccati.forward."""
    N, nx, nu = 6, 13, 4
    B = 128
    kn = _batched_problem(B, N, nx, nu, nc, seed=1)
    fac = jax.vmap(
        lambda kk: riccati.backward(
            gar.LQRProblem(
                knots=kk, G0=jnp.eye(nx, dtype=jnp.float32),
                g0=jnp.zeros(nx, jnp.float32),
            ),
            MUDYN, MUEQ, True,
        )
    )(kn)
    xs, us, vs, lams = jax.vmap(lambda f: riccati.forward(f))(fac)
    fields = {
        k: getattr(fac, k)[:, :N]
        for k in ("kff", "K", "zff", "Z", "lff", "L", "yff", "Afb")
    }
    xN, outs = pallas_stage.forward_lanes(fields, fac.x0, interpret=True)
    for a, b, nm in (
        (xs[:, :N], outs["x"], "x"),
        (us[:, :N], outs["u"], "u"),
        (vs[:, :N], outs["v"], "v"),
        (lams[:, 1:], outs["lam_next"], "lam"),
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, nm
        if a.size == 0:
            continue
        scale = np.max(np.abs(a)) + 1e-9
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, err_msg=nm)
    np.testing.assert_allclose(
        np.asarray(xN), np.asarray(xs[:, N]),
        atol=1e-4 * (np.max(np.abs(np.asarray(xs))) + 1e-9),
    )


def test_forward_dispatch_falls_back_on_cpu():
    """``forward(stage_fused=True)`` under vmap equals the plain scan on
    CPU (fp32-roundoff tolerance: the fallback branch vmaps the scan
    explicitly, which fuses differently)."""
    N, nx, nu, nc = 5, 13, 4, 2
    kn = _batched_problem(8, N, nx, nu, nc, seed=4)
    fac = jax.vmap(
        lambda kk: riccati.backward(
            gar.LQRProblem(
                knots=kk, G0=jnp.eye(nx, dtype=jnp.float32),
                g0=jnp.zeros(nx, jnp.float32),
            ),
            MUDYN, MUEQ, True,
        )
    )(kn)
    ref = jax.vmap(lambda f: riccati.forward(f))(fac)
    fus = jax.vmap(lambda f: riccati.forward(f, stage_fused=True))(fac)
    for a, b in zip(ref, fus):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, atol=5e-4 * (np.max(np.abs(a)) + 1e-9)
        )
