"""Real-time MPC benchmark: warm-started receding-horizon cycle rate.

The reference's raison d'être is real-time whole-body MPC (RSS 2024 /
TRO 2025 papers); the deployment-relevant number is the per-cycle latency
of (apply control → shift warm start → re-solve with a small iteration
budget). Two metrics on the real chip:

* ``mpc_cycle_latency_ms`` — ONE scenario, latency per MPC cycle (serial
  LQ path; the associative O(log N) solver needs a vector-space problem and
  is benchmarked separately in bench.py extras). Measured by
  chaining M cycles inside a single dispatch (`lax.scan`, each cycle
  data-dependent on the previous) and dividing — the tunnel RTT (~20 ms)
  is paid once per dispatch, not per cycle.
* ``mpc_batch_cycles_per_sec`` — 4096 scenarios cycled in lockstep (the
  fleet-serving configuration), cycles/s × batch.

Protocol: SE(2)-car N=50, warm-started, ProxDDP max_iters=2, tol=1e-4
(cycles converge in 1-2 inner iterations when warm — asserted by
``tests/test_mpc.py::test_mpc_warm_start_converges_in_two_iters``).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from aligator_tpu import solvers, utils  # noqa: E402
from aligator_tpu._pytree import replace  # noqa: E402
from examples.se2_car import create_se2_problem  # noqa: E402


def make_mpc_scan(problem, cfg, n_cycles):
    space = problem.space
    stage0 = problem.stage_at(0)

    def cycle(carry, _):
        x_cur, xs_w, us_w = carry
        u0 = us_w[0]
        x_next = stage0.dynamics.forward(space, x_cur, u0)
        xs_w2, us_w2 = utils.cycle_warm_start(xs_w, us_w)
        r = solvers.solve(
            replace(problem, x0=x_next), cfg, xs_init=xs_w2, us_init=us_w2
        )
        return (x_next, r.xs, r.us), (r.prim_infeas, r.dual_infeas)

    def run(x0, xs_w, us_w):
        (xf, xs_f, us_f), (prims, duals) = lax.scan(
            cycle, (x0, xs_w, us_w), None, length=n_cycles
        )
        return xf, xs_f, us_f, prims, duals

    return run


def main():
    dtype = jnp.float32
    n_cycles = 20
    problem = create_se2_problem(nsteps=50, dtype=dtype)
    cfg_cold = solvers.ProxDDPConfig(
        tol=1e-4, mu_init=1e-3, max_iters=10, max_al_iters=4,
        rollout="linear", ls_max_steps=6,
    )
    cfg_warm = solvers.ProxDDPConfig(
        tol=1e-4, mu_init=1e-3, max_iters=2, max_al_iters=2,
        rollout="linear", ls_max_steps=6,
    )

    # --- single-scenario latency ---
    cold = solvers.solve(problem, cfg_cold)
    run = jax.jit(make_mpc_scan(problem, cfg_warm, n_cycles))
    xf, xs_f, us_f, prims, duals = run(problem.x0, cold.xs, cold.us)
    float(xf[0])
    ts = []
    for i in range(1, 4):
        x0p = problem.x0 + jnp.asarray(i * 1e-5, dtype)
        t0 = time.perf_counter()
        xf, *_ = run(x0p, cold.xs, cold.us)
        float(xf[0])
        ts.append(time.perf_counter() - t0)
    lat_ms = min(ts) / n_cycles * 1e3
    frac_ok = float(
        jnp.mean((prims <= cfg_warm.tol).astype(jnp.float32))
    )
    print(json.dumps({
        "metric": "mpc_cycle_latency_ms", "value": round(lat_ms, 3),
        "unit": "ms/cycle", "n_cycles": n_cycles,
        "frac_cycles_prim_ok": round(frac_ok, 3),
    }))

    # --- batched fleet configuration (serial/fused LQ path) ---
    batch = 4096
    cfg_batch = solvers.ProxDDPConfig(
        tol=1e-4, mu_init=1e-3, max_iters=2, max_al_iters=2,
        rollout="linear", ls_max_steps=6,
    )
    key = jax.random.PRNGKey(0)
    d_p = 0.2 * jax.random.normal(key, (batch, 2), dtype)
    th0 = 0.15355 + 0.2 * jax.random.normal(jax.random.PRNGKey(1), (batch,), dtype)
    x0s = jnp.stack(
        [0.7 + d_p[:, 0], -0.1 + d_p[:, 1], jnp.cos(th0), jnp.sin(th0)], -1
    )

    @jax.jit
    def cold_batch(x0s):
        return jax.vmap(
            lambda x0: solvers.solve(replace(problem, x0=x0), cfg_cold)
        )(x0s)

    cold_b = cold_batch(x0s)
    run_b = jax.jit(jax.vmap(make_mpc_scan(problem, cfg_batch, n_cycles)))
    out = run_b(x0s, cold_b.xs, cold_b.us)
    float(out[0].sum())
    ts = []
    for i in range(1, 4):
        x0p = x0s + jnp.asarray(i * 1e-5, dtype)
        t0 = time.perf_counter()
        out = run_b(x0p, cold_b.xs, cold_b.us)
        float(out[0].sum())
        ts.append(time.perf_counter() - t0)
    cps = batch * n_cycles / min(ts)
    print(json.dumps({
        "metric": "mpc_batch_cycles_per_sec", "value": round(cps, 1),
        "unit": "scenario-cycles/s", "batch": batch, "n_cycles": n_cycles,
    }))

    # --- humanoid-dims cycle (round-5 VERDICT item 9: the 3.2 ms number
    # was SE2-only; reference tests/mpc-cycle.cpp:136 runs the cycle at
    # whole-body dims) — nx=36 / nu=12 / N=100, warm-started, batched ---
    from bench import make_humanoid_dims_problem

    hproblem = make_humanoid_dims_problem(nsteps=100, dtype=dtype)
    hcold = solvers.solve(hproblem, cfg_cold)
    hrun = jax.jit(make_mpc_scan(hproblem, cfg_warm, n_cycles))
    xf, *_ , hprims, _hd = hrun(hproblem.x0, hcold.xs, hcold.us)
    float(xf[0])
    ts = []
    for i in range(1, 4):
        x0p = hproblem.x0 + jnp.asarray(i * 1e-5, dtype)
        t0 = time.perf_counter()
        xf, *_ = hrun(x0p, hcold.xs, hcold.us)
        float(xf[0])
        ts.append(time.perf_counter() - t0)
    hlat_ms = min(ts) / n_cycles * 1e3
    print(json.dumps({
        "metric": "mpc_cycle_latency_humanoid_ms",
        "value": round(hlat_ms, 3),
        "unit": "ms/cycle", "n_cycles": n_cycles, "nx": 36, "nsteps": 100,
        "frac_cycles_prim_ok": round(float(
            jnp.mean((hprims <= cfg_warm.tol).astype(jnp.float32))
        ), 3),
    }))

    hbatch = 128
    hx0s = hproblem.x0 + 0.05 * jax.random.normal(
        jax.random.PRNGKey(5), (hbatch, hproblem.x0.shape[0]), dtype
    )

    @jax.jit
    def hcold_batch(x0s_):
        return jax.vmap(
            lambda x0: solvers.solve(replace(hproblem, x0=x0), cfg_cold)
        )(x0s_)

    hcold_b = hcold_batch(hx0s)
    hrun_b = jax.jit(jax.vmap(make_mpc_scan(hproblem, cfg_batch, n_cycles)))
    out = hrun_b(hx0s, hcold_b.xs, hcold_b.us)
    float(out[0].sum())
    ts = []
    for i in range(1, 4):
        x0p = hx0s + jnp.asarray(i * 1e-5, dtype)
        t0 = time.perf_counter()
        out = hrun_b(x0p, hcold_b.xs, hcold_b.us)
        float(out[0].sum())
        ts.append(time.perf_counter() - t0)
    hcps = hbatch * n_cycles / min(ts)
    print(json.dumps({
        "metric": "mpc_batch_cycles_per_sec_humanoid",
        "value": round(hcps, 1),
        "unit": "scenario-cycles/s", "batch": hbatch, "n_cycles": n_cycles,
    }))


if __name__ == "__main__":
    main()
