"""Benchmark: batched SE(2)-car ProxDDP solves/s on one chip.

Mirrors the reference benchmark protocol (``bench/se2-car.cpp:11-16``):
SE(2) car parking, N = 50 steps, ProxDDP with tol = 1e-3, μ₀ = 1e-3,
max_iters = 4, LINEAR rollout — but batched over thousands of scenarios
(randomized initial states), which is the TPU execution model.

Prints ONE JSON line:
  {"metric": "se2car_solves_per_sec", "value": N, "unit": "solves/s",
   "vs_baseline": ratio, ...extras}

Extras in the same line:
  * ``humanoid_solves_per_sec`` — ProxDDP at humanoid dims (nx=36, nu=12,
    N=100, control bounds; the dims of the reference gar bench
    ``bench/gar-riccati.cpp:18``), batch 1024.
  * ``gar_fused_lq_solves_per_sec`` / ``gar_fused_speedup_vs_scan`` /
    ``gar_fused_min_traffic_gbps`` — the fused Pallas Riccati kernel at the
    se2-car LQ shape vs the XLA scan path; bandwidth is on a minimum-traffic
    basis (the recursion runs entirely out of VMEM). The scan path is
    launch-overhead-bound (~100 sequential tiny kernels), the fused kernel
    removes that — this replaces the round-1 "scan is at memory speed of
    light" claim, which did not survive measurement with synchronous
    readback.

  * ``lqr56_proxddp_solves_per_sec`` / ``lqr56_fddp_solves_per_sec`` —
    both solvers at the reference dense-LQR shape (``bench/lqr.cpp:23-57``,
    nx=56, nu=22, N=100, max_iters=2), batch 256.

Baseline: the north-star target is 10,000 solves/s on a v5e-64 slice
(BASELINE.md) → 156.25 solves/s/chip; vs_baseline = value / 156.25.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from aligator_tpu import core, solvers  # noqa: E402
from aligator_tpu._pytree import replace  # noqa: E402
from aligator_tpu.gar import lqr_problem as gar  # noqa: E402
from aligator_tpu.gar import riccati  # noqa: E402
from examples.se2_car import create_se2_problem  # noqa: E402

BASELINE_SOLVES_PER_SEC_PER_CHIP = 10_000 / 64.0
V5E_HBM_PEAK_GBPS = 819.0


def _tree_bytes(tree):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize for l in jax.tree.leaves(tree)
    )


# --- timing discipline for the tunneled backend -------------------------
# Two measurement hazards, both observed on this stack (see CLAUDE.md):
#   1. identical-argument dispatches can be served from a cache;
#   2. ``block_until_ready`` does not reliably wait for remote execution —
#      only a host readback (``float(...)``) does.
# Every timed region therefore (a) perturbs its input per repetition with a
# data dependence on the previous result (prevents caching AND cross-
# iteration reordering), and (b) ends with a scalar host readback. The
# ~20 ms tunnel RTT is amortized with several repetitions per dispatch
# where the per-solve time is small.


def timed_solves(solve_scalar, x0s, n_rep=3):
    """min over reps of one synchronous dispatch; returns seconds/batch.

    ``solve_scalar(x0s) -> scalar`` must consume every output it wants
    timed (sums), so nothing is dead-code-eliminated.
    """
    f = jax.jit(solve_scalar)
    float(f(x0s))  # compile + warm
    ts = []
    for i in range(1, n_rep + 1):
        pert = x0s + jnp.asarray(i * 1e-6, x0s.dtype)
        t0 = time.perf_counter()
        float(f(pert))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_gar_lq(batch=8192, N=50, nx=4, nu=2, nc=2, n_rep=5):
    """Raw LQ-solve throughput: fused Pallas kernel vs the XLA scan path,
    plus the fused kernel's achieved HBM bandwidth on a minimum-traffic
    basis (inputs read once + outputs written once — a lower bound, since
    the whole recursion runs out of VMEM)."""
    from aligator_tpu.gar import pallas_riccati

    dtype = jnp.float32
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    probs = jax.vmap(
        lambda k: gar.random_problem(k, N, nx, nu, nc, dtype=dtype)
    )(keys)

    # chained in-dispatch repetition (see the timing-discipline note above):
    # m solves inside ONE dispatch, each perturbed by the previous result so
    # nothing can be cached, hoisted, or overlapped; one host readback.
    def chained(solver, m):
        @jax.jit
        def run(probs):
            def body(i, acc):
                p = replace(
                    probs,
                    knots=replace(
                        probs.knots,
                        q=probs.knots.q
                        + i * 1e-6
                        + acc[:, None, :] * 1e-20,
                    ),
                )
                xs, us, vs, lams = solver(p)
                extra = us.sum() + vs.sum() + lams.sum()
                return acc + xs.mean(axis=1) + extra * jnp.float32(1e-20)

            return jax.lax.fori_loop(
                0, m, body, jnp.zeros((batch, nx), dtype)
            ).sum()

        float(run(probs))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(probs))
            ts.append(time.perf_counter() - t0)
        return min(ts) / m

    times = {
        "scan": chained(
            lambda p: jax.vmap(
                lambda pp: riccati.solve(pp, 1e-3, 1e-3, True)
            )(p),
            5,
        ),
        "fused": chained(
            lambda p: pallas_riccati.solve(p, 1e-3, 1e-3), 40
        ),
    }

    out_shape = jax.eval_shape(
        lambda p: pallas_riccati.solve(p, 1e-3, 1e-3), probs
    )
    nbytes = _tree_bytes(probs) + _tree_bytes(out_shape)
    return dict(
        fused_solves_per_sec=batch / times["fused"],
        fused_speedup_vs_scan=times["scan"] / times["fused"],
        fused_min_traffic_gbps=nbytes / times["fused"] / 1e9,
    )


def make_humanoid_dims_problem(nsteps=100, dtype=jnp.float32):
    """ProxDDP problem at humanoid dims (nx=36, nu=12): an 18-DoF
    double-integrator chain with a 6-DoF unactuated (floating-base-like)
    block and control bounds."""
    nq = 18
    nx, nu = 2 * nq, 12
    dt_ = 0.02
    I = jnp.eye(nq, dtype=dtype)
    A = jnp.block([[I, dt_ * I], [jnp.zeros((nq, nq), dtype), I]])
    Bv = jnp.concatenate([jnp.zeros((6, nu), dtype), jnp.eye(nu, dtype=dtype)])
    B = jnp.concatenate([jnp.zeros((nq, nu), dtype), dt_ * Bv])
    space = core.VectorSpace(nx)
    dyn = core.LinearDiscreteDynamics(A=A, B=B, c=jnp.zeros((nx,), dtype))
    cost = core.QuadraticCost.create(
        0.01 * jnp.eye(nx, dtype=dtype), 0.001 * jnp.eye(nu, dtype=dtype)
    )
    term_cost = core.QuadraticCost.create(
        10.0 * jnp.eye(nx, dtype=dtype), jnp.zeros((nu, nu), dtype)
    )
    constraints = (
        (
            core.ControlErrorResidual(target=jnp.zeros((nu,), dtype)),
            core.BoxConstraint(
                lower=-2.0 * jnp.ones((nu,), dtype),
                upper=2.0 * jnp.ones((nu,), dtype),
            ),
        ),
    )
    stage = core.make_stage(cost, dyn, space, nu, constraints)
    x0 = jnp.zeros((nx,), dtype).at[0].set(0.5)
    return core.make_problem(x0, stage, nsteps, term_cost)


def bench_humanoid(batch=1024, n_rep=3):
    dtype = jnp.float32
    problem = make_humanoid_dims_problem(nsteps=100, dtype=dtype)
    cfg = solvers.ProxDDPConfig(
        tol=1e-3, mu_init=1e-3, max_iters=4, max_al_iters=4,
        rollout="linear", ls_max_steps=6,
    )
    x0s = problem.x0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (batch, problem.x0.shape[0]), dtype
    )

    @jax.jit
    def solve_batch(x0s):
        def one(x0):
            res = solvers.solve(replace(problem, x0=x0), cfg)
            return res.us, res.prim_infeas

        return jax.vmap(one)(x0s)

    def scalar(x0s):
        us, prim = solve_batch(x0s)
        return us.sum() + prim.sum()

    dt = timed_solves(scalar, x0s, n_rep=n_rep)
    return batch / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    nsteps = 50
    dtype = jnp.float32

    problem = create_se2_problem(nsteps=nsteps, dtype=dtype)
    # ls_strategy='filter': same 4x4 budget, same protocol (the filter is a
    # reference step-acceptance strategy, core/filter.hpp:12). The r2 bench
    # used the nonmonotone linesearch and converged 72% of draws; the fp64
    # NumPy oracle ablation (tests/test_convergence_ablation.py) showed that
    # tail is budget-bound for BACKTRACKING acceptance — the filter accepts
    # the full Newton steps those draws need and reaches 100% at identical
    # cost per iteration.
    cfg = solvers.ProxDDPConfig(
        tol=1e-3,
        mu_init=1e-3,
        max_iters=4,
        max_al_iters=4,
        rollout="linear",
        ls_max_steps=6,
        ls_strategy="filter",
    )

    # randomized parking scenarios: perturb the nominal initial state
    key = jax.random.PRNGKey(0)
    d_p = 0.2 * jax.random.normal(key, (batch, 2), dtype)
    d_th = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (batch,), dtype)
    theta0 = 0.15355 + d_th
    x0s = jnp.stack(
        [
            0.7 + d_p[:, 0],
            -0.1 + d_p[:, 1],
            jnp.cos(theta0),
            jnp.sin(theta0),
        ],
        axis=-1,
    )

    # past ~32768 scenarios the full solver state no longer fits HBM in one
    # vmap; chunk the batch inside the jit (lax.map reuses one chunk's
    # buffers), which extends the throughput curve past the r2 cliff
    chunk = min(batch, 32768)

    @jax.jit
    def solve_batch(x0s):
        def one(x0):
            res = solvers.solve(replace(problem, x0=x0), cfg)
            return res.us, res.prim_infeas, res.dual_infeas

        if batch <= chunk:
            return jax.vmap(one)(x0s)
        chunks = x0s.reshape(batch // chunk, chunk, x0s.shape[-1])
        out = jax.lax.map(lambda xc: jax.vmap(one)(xc), chunks)
        return jax.tree.map(lambda a: a.reshape((batch,) + a.shape[2:]), out)

    # compile
    us, prim, dual = solve_batch(x0s)
    us.block_until_ready()
    # solution-quality audit on the real chip: every solve must be finite
    # and at the protocol tolerance (guards against low-precision matmul
    # regressions that only show on TPU hardware)
    finite = np.isfinite(np.asarray(us)).all(axis=(1, 2))
    conv = finite & (np.asarray(prim) <= cfg.tol) & (np.asarray(dual) <= cfg.tol)
    frac_conv = float(conv.mean())

    # timed runs (see the timing-discipline note above)
    def scalar(x0s):
        us, prim, dual = solve_batch(x0s)
        return us.sum() + prim.sum() + dual.sum()

    dt_per_batch = timed_solves(scalar, x0s, n_rep=5)
    solves_per_sec = batch / dt_per_batch

    humanoid_sps = bench_humanoid()
    lq = bench_gar_lq()
    # ProxDDP-vs-FDDP at the reference bench/lqr.cpp shape (VERDICT r2
    # item 8: one JSON line carries both solvers)
    from bench_lqr import run_both as lqr_run_both

    lqr_rates = lqr_run_both(batch=256)

    # single-scenario LQ latency, serial vs associative O(log N), one
    # representative long-horizon config (round-5 VERDICT item 2; the
    # full sweep lives in bench_latency.py — measured r5: assoc wins
    # 8.4-10.9x at N >= 512)
    from bench_latency import assoc_solve, chained_latency, serial_solve
    from aligator_tpu import gar as _gar

    lat_prob = _gar.random_convex_problem(
        jax.random.PRNGKey(2052), 2048, 4, 2, 0, dtype=jnp.float32
    )
    lat_serial = chained_latency(serial_solve, lat_prob, k_lo=1, k_hi=3)
    lat_assoc = chained_latency(assoc_solve, lat_prob, k_lo=1, k_hi=3)

    out = {
        "metric": "se2car_solves_per_sec",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC_PER_CHIP, 3),
        "frac_converged": round(frac_conv, 4),
        "humanoid_solves_per_sec": round(humanoid_sps, 2),
        "gar_fused_lq_solves_per_sec": round(lq["fused_solves_per_sec"], 1),
        "gar_fused_speedup_vs_scan": round(lq["fused_speedup_vs_scan"], 2),
        "gar_fused_min_traffic_gbps": round(lq["fused_min_traffic_gbps"], 1),
        "lqr56_proxddp_solves_per_sec": round(lqr_rates["proxddp"], 1),
        "lqr56_fddp_solves_per_sec": round(lqr_rates["fddp"], 1),
        "lq_latency_serial_N2048_ms": round(lat_serial * 1e3, 3),
        "lq_latency_assoc_N2048_ms": round(lat_assoc * 1e3, 3),
        "lq_latency_assoc_speedup": round(lat_serial / lat_assoc, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
