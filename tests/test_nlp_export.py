"""NLP export (reference ``examples/convert_to_nlp.py`` role) + scipy
cross-validation oracle: a generic NLP solver must reproduce the ProxDDP
solution of a control-bounded LQR."""

import jax.numpy as jnp
import numpy as np

from aligator_tpu import solvers
from aligator_tpu.utils import nlp
from examples.lqr import make_lqr_problem


def test_scipy_nlp_matches_proxddp_box_lqr():
    problem = make_lqr_problem(nsteps=20, u_bound=0.15)
    cfg = solvers.ProxDDPConfig(tol=1e-10, mu_init=1e-2, max_iters=200)
    res = solvers.solve(problem, cfg)
    assert bool(res.conv)

    N = problem.nsteps
    xs0 = jnp.broadcast_to(problem.x0, (N + 1,) + problem.x0.shape)
    us0 = jnp.zeros((N, problem.nu), problem.x0.dtype)
    xs, us, r = nlp.solve_scipy(problem, xs0, us0, tol=1e-12)
    assert r.success, r.message

    np.testing.assert_allclose(np.asarray(us), np.asarray(res.us), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(res.xs), atol=1e-6)
    # the bound is genuinely active somewhere (the test is not vacuous)
    assert float(jnp.max(jnp.abs(res.us))) > 0.15 - 1e-8


def test_nlp_export_shapes():
    problem = make_lqr_problem(nsteps=10, u_bound=0.2)
    N = problem.nsteps
    xs0 = jnp.broadcast_to(problem.x0, (N + 1,) + problem.x0.shape)
    us0 = jnp.zeros((N, problem.nu), problem.x0.dtype)
    fns = nlp.to_nlp(problem, xs0, us0)
    z = jnp.zeros((fns["nz"],), problem.x0.dtype)
    assert fns["objective"](z).shape == ()
    # eq rows: init (2) + dynamics (10*2); ineq rows: 2 per bound row per stage
    assert fns["cons_eq"](z).shape == (2 + 20,)
    assert fns["cons_ineq"](z).shape == (2 * 10,)
    assert fns["jac_eq"](z).shape == (22, fns["nz"])
