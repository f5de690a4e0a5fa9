"""Talos-walk whole-body OCP solve-time benchmark (reference
``bench/talos-walk.cpp`` analog, batched).

Fixed-budget timing per the se2-car protocol (max_iters=4, tol=1e-3,
μ₀=1e-3): this measures solver throughput on the whole-body multi-contact
problem (nv=28 humanoid, 6D flat-foot contacts, semi-implicit Euler,
control bounds), not convergence — the walk needs ~30+ iterations to
converge (see examples/talos_walk.py).

Prints ONE JSON line. Kept separate from bench.py because the whole-body
autodiff stack compiles for ~6 min on the tunneled TPU.

Measured (TPU v5e, 2026-08-19): {"metric": "talos_walk_solves_per_sec",
"value": 20.3, "unit": "solves/s", "batch": 16, "nsteps": 32}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from aligator_tpu import solvers  # noqa: E402
from aligator_tpu._pytree import replace  # noqa: E402
from examples.talos_walk import create_talos_walk_problem  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    problem, model, sched = create_talos_walk_problem(
        t_ds=4, t_ss=10, dtype=jnp.float32
    )
    cfg = solvers.ProxDDPConfig(
        tol=1e-3, mu_init=1e-3, max_iters=4, max_al_iters=4,
        rollout="linear", ls_max_steps=6, force_initial_condition=True,
    )
    x0 = problem.x0
    d = 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, model.nv), jnp.float32
    )

    @jax.jit
    def solve_batch(dv):
        def one(dvi):
            x0i = x0.at[model.nq:].add(dvi)
            res = solvers.solve(replace(problem, x0=x0i), cfg)
            return res.us, res.prim_infeas

        return jax.vmap(one)(dv)

    def scalar(dv):
        us, prim = solve_batch(dv)
        return us.sum() + prim.sum()

    g = jax.jit(scalar)
    float(g(d))  # compile + warm
    ts = []
    for i in range(1, 4):  # perturbed reps + host readback (bench.py note)
        t0 = time.perf_counter()
        float(g(d + jnp.float32(i * 1e-6)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        json.dumps(
            {
                "metric": "talos_walk_solves_per_sec",
                "value": round(batch / dt, 2),
                "unit": "solves/s",
                "batch": batch,
                "nsteps": int(sched.shape[0]),
                "nv": int(model.nv),
            }
        )
    )


if __name__ == "__main__":
    main()
