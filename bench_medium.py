"""Medium-dim (nx=36) Riccati ablation bench — VERDICT r2 item 3.

The humanoid-dim LQ path (nx=36, nu=12, N=100 — the reference gar bench
shape, ``bench/gar-riccati.cpp:18``) runs on the XLA scan, which round 2
measured at ~2x off the VPU roofline. This harness measures the two
prescribed ablations on real TPU hardware:

  (a) k-stage scan-body unrolling (``lax.scan(..., unroll=k)``) — amortizes
      per-step launch/HBM round-trips across k stage kernels;
  (b) bf16 value-propagation GEMMs (A'V, B'V, A'VA, B'VB, A'VB in bf16
      inputs, fp32 accumulation) with the KKT core kept fp32
      (``_precision.py`` policy) — halves the HBM bytes of the widest
      per-stage operands;

plus the round-3 addition that actually attacks the measured bottleneck —
the serial scan is ~80× off the min-traffic HBM roofline, i.e. bound by
the *sequential step count*, not operand bytes — namely:

  (c) parallel-in-time leg condensation ON ONE CHIP (``gar/parallel.py``,
      L legs): the stage recursion shortens N → N/L while the vmapped leg
      axis widens every batched op L×, trading sequential depth for
      arithmetic width (the same trade the fused Pallas kernel makes at
      small dims via lanes).

Every variant carries a KKT-residual accuracy audit (fp32) and the HBM
min-traffic roofline for context. Problems are JOINTLY convex
(``gar.random_convex_problem``) — the class ProxDDP emits and the leg
split's operating domain (see gar/parallel.py docstring).

Round-3 measured (v5e, batch 1024): u2/u4/u10 unrolling all SLOWER than
the plain scan (358/278/275 vs 257 ms — unrolling enlarges the live set
per step and spills); bf16 propagation 245 ms (+5%) but degrades the max
dual residual 160× (0.089 → 14.3) — rejected per the _precision.py
policy. Leg condensation is the keeper (see README).

Timing discipline per CLAUDE.md: chained in-dispatch repetitions with a
data-dependent perturbation per rep; one host readback per timed dispatch.

Usage: ``python bench_medium.py [batch]`` — prints one JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from aligator_tpu._pytree import replace  # noqa: E402
from aligator_tpu.gar import lqr_problem as gar  # noqa: E402
from aligator_tpu.gar import parallel as gar_parallel  # noqa: E402
from aligator_tpu.gar import riccati  # noqa: E402

V5E_HBM_PEAK_GBPS = 819.0


def _tree_bytes(tree):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize for l in jax.tree.leaves(tree)
    )


def chained(solver, probs, batch, nx, m, reps=3):
    """min over reps of (one dispatch of m chained solves) / m, seconds."""

    @jax.jit
    def run(probs):
        def body(i, acc):
            p = replace(
                probs,
                knots=replace(
                    probs.knots,
                    q=probs.knots.q + i * 1e-6 + acc[:, None, :] * 1e-20,
                ),
            )
            xs, us, vs, lams = solver(p)
            extra = us.sum() + vs.sum() + lams.sum()
            return acc + xs.mean(axis=1) + extra * jnp.float32(1e-20)

        return jax.lax.fori_loop(
            0, m, body, jnp.zeros((batch, nx), jnp.float32)
        ).sum()

    float(run(probs))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(probs))
        ts.append(time.perf_counter() - t0)
    return min(ts) / m


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N, nx, nu, nc = 100, 36, 12, 12
    dtype = jnp.float32
    mu = 1e-3

    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    probs = jax.vmap(
        lambda k: gar.random_convex_problem(k, N, nx, nu, nc, dtype=dtype)
    )(keys)

    def solver(unroll, bf16):
        def f(p):
            return jax.vmap(
                lambda pp: riccati.forward(
                    riccati.backward(
                        pp, mu, mu, True, unroll=unroll, bf16_prop=bf16
                    ),
                    unroll=unroll,
                )
            )(p)

        return f

    def leg_solver(legs):
        def f(p):
            return jax.vmap(
                lambda pp: gar_parallel.solve(
                    pp, mu, mu, legs=legs, assume_explicit=True
                )
            )(p)

        return f

    # accuracy audit: max KKT residual across a probe subset, per variant
    nprobe = min(batch, 64)
    probe = jax.tree.map(lambda a: a[:nprobe], probs)

    @jax.jit
    def kkt_err(p, xs, us, vs, lams):
        return jax.vmap(
            lambda pp, x, u, v, l: jnp.stack(
                gar.kkt_error(pp, x, u, v, l, mu, mu)
            )
        )(p, xs, us, vs, lams)

    variants = {
        "u1": solver(1, False),
        "u4": solver(4, False),
        "u1_bf16": solver(1, True),
        "legs4": leg_solver(4),
        "legs8": leg_solver(8),
        "legs16": leg_solver(16),
    }
    times, errs = {}, {}
    for name, sv in variants.items():
        times[name] = chained(sv, probs, batch, nx, m=3)
        xs, us, vs, lams = jax.jit(sv)(probe)
        errs[name] = float(jnp.max(kkt_err(probe, xs, us, vs, lams)))

    # HBM min-traffic roofline: problem read once + solution written once
    sol_shape = jax.eval_shape(solver(1, False), probs)
    nbytes = _tree_bytes(probs) + _tree_bytes(sol_shape)
    t_roofline = nbytes / (V5E_HBM_PEAK_GBPS * 1e9)

    best = min(times, key=times.get)
    out = {
        "metric": "medium_dim_lq_solves_per_sec",
        "value": round(batch / times[best], 1),
        "unit": "solves/s",
        "vs_baseline": round(times["u1"] / times[best], 3),
        "batch": batch,
        "dims": f"nx={nx},nu={nu},nc={nc},N={N}",
        "best": best,
        "ms_per_batch": {k: round(v * 1e3, 2) for k, v in times.items()},
        "kkt_err": {k: float(f"{v:.3e}") for k, v in errs.items()},
        "hbm_roofline_ms": round(t_roofline * 1e3, 2),
        "frac_of_min_traffic_roofline": round(t_roofline / times[best], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
