"""utils — rollout, MPC cycling, logging, plotting."""

from .logger import Logger, log_row, print_history
from .mpc import cycle_problem, cycle_warm_start, roll_left
from .rollout import closed_loop_rollout, rollout

__all__ = [
    "Logger",
    "log_row",
    "print_history",
    "cycle_problem",
    "cycle_warm_start",
    "roll_left",
    "rollout",
    "closed_loop_rollout",
]
