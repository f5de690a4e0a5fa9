"""Checkpoint/resume of solver state (SURVEY §5.4).

The solver's results and warm-start state are plain pytrees of arrays, so
checkpointing rides orbax directly: save a converged solve + the cycled
warm start, restore in a fresh tree, and resume the MPC loop bit-for-bit.
This is the aux-subsystem counterpart of the reference's
workspace/results serialization role.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligator_tpu import solvers
from aligator_tpu.utils.mpc import cycle_warm_start


def _make_problem():
    from tests.test_proxddp import make_lqr

    return make_lqr(nsteps=12, u_bound=0.25)


def test_orbax_roundtrip_and_resume(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")

    problem = _make_problem()
    cfg = solvers.ProxDDPConfig(tol=1e-8, max_iters=40)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)

    warm = dict(
        xs=res.xs, us=res.us, vs=res.vs, lams=res.lams,
        prim=res.prim_infeas,
    )
    path = tmp_path / "ckpt"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, warm)
        restored = ckptr.restore(path, warm)

    for k in warm:
        assert np.array_equal(np.asarray(warm[k]), np.asarray(restored[k])), k

    # resume: cycle the restored warm start and re-solve — must match the
    # same continuation from the live state exactly
    def continue_from(state):
        xs, us, vs, lams = cycle_warm_start(
            state["xs"], state["us"], vs=state["vs"], lams=state["lams"],
            problem=problem,
        )
        r = solvers.solve(problem, cfg, xs_init=xs, us_init=us,
                          vs_init=vs, lams_init=lams)
        return r

    r_live = continue_from(warm)
    r_restored = continue_from(restored)
    assert np.array_equal(np.asarray(r_live.us), np.asarray(r_restored.us))
    assert int(r_live.num_iters) == int(r_restored.num_iters)
