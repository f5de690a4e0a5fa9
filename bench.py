"""Benchmark: batched SE(2)-car ProxDDP solves/s on one chip.

Mirrors the reference benchmark protocol (``bench/se2-car.cpp:11-16``):
SE(2) car parking, N = 50 steps, ProxDDP with tol = 1e-3, μ₀ = 1e-3,
max_iters = 4, LINEAR rollout — but batched over thousands of scenarios
(randomized initial states), which is the TPU execution model.

Prints ONE JSON line:
  {"metric": "se2car_solves_per_sec", "value": N, "unit": "solves/s",
   "vs_baseline": ratio}

Baseline: the north-star target is 10,000 solves/s on a v5e-64 slice
(BASELINE.md) → 156.25 solves/s/chip; vs_baseline = value / 156.25.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from aligator_tpu import solvers  # noqa: E402
from aligator_tpu._pytree import replace  # noqa: E402
from examples.se2_car import create_se2_problem  # noqa: E402

BASELINE_SOLVES_PER_SEC_PER_CHIP = 10_000 / 64.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nsteps = 50
    dtype = jnp.float32

    problem = create_se2_problem(nsteps=nsteps, dtype=dtype)
    cfg = solvers.ProxDDPConfig(
        tol=1e-3,
        mu_init=1e-3,
        max_iters=4,
        max_al_iters=4,
        rollout="linear",
        ls_max_steps=6,
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

    @jax.jit
    def solve_batch(x0s):
        def one(x0):
            res = solvers.solve(replace(problem, x0=x0), cfg)
            return res.us, res.prim_infeas

        return jax.vmap(one)(x0s)

    # compile
    us, prim = solve_batch(x0s)
    us.block_until_ready()

    # timed runs
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        us, prim = solve_batch(x0s)
    us.block_until_ready()
    t1 = time.perf_counter()

    dt_per_batch = (t1 - t0) / n_rep
    solves_per_sec = batch / dt_per_batch

    out = {
        "metric": "se2car_solves_per_sec",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
