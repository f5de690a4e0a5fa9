"""Smoke tests for the flagship multibody examples (short horizons).

These are the heaviest compile paths in the repo (whole-body contact
dynamics, collision constraints); everything else about them is covered by
unit tests of their building blocks, but a full solve-through catches
integration bit-rot the unit tests can't.
"""

import jax.numpy as jnp
import pytest

from aligator_tpu import solvers


@pytest.mark.slow
def test_talos_walk_short_horizon():
    """Whole-body Talos walk (nv=28, 6D flat-foot contact schedule) on a
    2-step gait snippet: the solver must reach protocol tolerances."""
    from examples.talos_walk import create_talos_walk_problem

    problem, model, sched = create_talos_walk_problem(t_ds=2, t_ss=4)
    cfg = solvers.ProxDDPConfig(
        tol=1e-3, mu_init=1e-3, max_iters=10, rollout="linear",
        force_initial_condition=True,
    )
    res = solvers.solve(problem, cfg)
    assert bool(res.conv), (float(res.prim_infeas), float(res.dual_infeas))
    # the base must stay upright-ish over the snippet
    assert float(jnp.min(res.xs[:, 2])) > 0.5


@pytest.mark.slow
def test_panda_reach_with_collision():
    """Panda SE(3) reach with capsule collision constraints and torque
    bounds (examples/panda_mujoco_test_se3_collision.py role)."""
    import numpy as np

    from examples.panda_reach import create_panda_problem
    from aligator_tpu.modelling.multibody import model as rbd

    problem, model, (R_t, p_t) = create_panda_problem(nsteps=25)
    # round 4: the example defaults to the REAL vendored Panda (armature,
    # identified inertias) which needs ~200 iterations where the nominal
    # approximation needed ~120 — the nonmonotone default converges in 202
    cfg = solvers.ProxDDPConfig(
        tol=1e-4, mu_init=1e-2, max_iters=300, rollout="nonlinear",
    )
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)
    qN = res.xs[-1][: model.nq]
    _, p = rbd.frame_placement(model, qN, model.frame_id("ee"))
    assert float(jnp.linalg.norm(p - p_t)) < 0.05
    # collision constraint respected along the whole trajectory
    post_a = np.array([0.25, 0.25, 0.0])
    post_b = np.array([0.25, 0.25, 0.9])

    for x in np.asarray(res.xs):
        q = jnp.asarray(x[: model.nq])
        _, pe = rbd.frame_placement(model, q, model.frame_id("ee"))
        pe = np.asarray(pe)
        ab = post_b - post_a
        t = np.clip(np.dot(pe - post_a, ab) / np.dot(ab, ab), 0.0, 1.0)
        d = np.linalg.norm(pe - (post_a + t * ab))
        assert d > 0.12 - 1e-3, d
