"""Receding-horizon MPC utilities.

Counterpart of the reference's problem/solver cycling machinery
(``TrajOptProblem::replaceStageCircular`` — ``core/traj-opt-problem.hpp:196``,
``SolverProxDDP::cycleProblem`` — ``solver-proxddp.hxx:192``,
``rotate_vec_left`` — ``utils/mpc-util.hpp:17``). In the stacked-array world
cycling is a `jnp.roll` on the time axis — fixed-shape, jit-compatible, and
the natural amortized-warm-start mechanism for real-time MPC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import replace
from ..core.problem import TrajOptProblem


def roll_left(a, new_last=None):
    """Rotate a stacked array one step left along the time axis; optionally
    write ``new_last`` into the freed last slot (else the old first entry
    wraps around)."""
    out = jnp.roll(a, -1, axis=0)
    if new_last is not None:
        out = out.at[-1].set(new_last)
    return out


def cycle_problem(
    problem: TrajOptProblem, new_stage=None, new_x0=None
) -> TrajOptProblem:
    """Rotate the stage stack one step left (replaceStageCircular).

    ``new_stage``: a single-stage pytree (no time axis) to install at the end;
    defaults to recycling the popped first stage. ``new_x0`` updates the
    initial state for the shifted horizon.
    """
    if new_stage is None:
        stages = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0), problem.stages)
    else:
        stages = jax.tree.map(
            lambda a, n: jnp.roll(a, -1, axis=0).at[-1].set(n),
            problem.stages,
            new_stage,
        )
    kw = dict(stages=stages)
    if new_x0 is not None:
        kw["x0"] = new_x0
    return replace(problem, **kw)


def cycle_warm_start(xs, us, vs=None, lams=None, space=None, problem=None):
    """Rotate a previous solution one step left for warm-starting the next
    MPC solve (results/workspace cycleAppend). The final entries duplicate
    the previous last values.

    If ``problem`` is given, the tail of the shifted trajectory is repaired
    instead of duplicated: the new terminal state is rolled out through the
    last stage's dynamics (keeping the warm start dynamics-feasible) and the
    terminal costate is refreshed to the terminal-cost gradient there. With
    small ALM penalties (the reference MPC protocol runs mu_init=1e-8,
    tests/mpc-cycle.cpp:166) a tail gap or stale costate is amplified by
    1/mudyn and costs several Newton iterations to heal.
    """
    xs_w = roll_left(xs, new_last=xs[-1])
    us_w = roll_left(us, new_last=us[-1])
    x_tail = None
    if problem is not None:
        sp = problem.space if space is None else space
        stage_last = problem.stage_at(problem.nsteps - 1)
        x_tail = stage_last.dynamics.forward(sp, xs_w[-2], us_w[-1])
        xs_w = xs_w.at[-1].set(x_tail)
    out = [xs_w, us_w]
    if vs is not None:
        out.append(roll_left(vs, new_last=vs[-1]))
    if lams is not None:
        lams_w = roll_left(lams, new_last=lams[-1])
        if x_tail is not None:
            # at the solution the terminal costate equals the terminal-cost
            # gradient; a stale duplicate leaves an O(|Δx_N|) dual error
            sp = problem.space if space is None else space
            u0 = jnp.zeros_like(us_w[-1])
            tLx, _ = problem.term_cost.gradients(sp, x_tail, u0)
            lams_w = lams_w.at[-1].set(tLx)
        out.append(lams_w)
    return tuple(out)
