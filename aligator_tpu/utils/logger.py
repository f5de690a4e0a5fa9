"""Columnar solver-trace logger.

Counterpart of the reference's fixed-width table logger
(``include/aligator/utils/logger.hpp:22-56``). Host-side: feed it a recorded
history array (``ProxDDPResults.history``) or add rows manually.
"""

from __future__ import annotations

import re

BASIC_KEYS = (
    ("iter", "{:>5d}"),
    ("alpha", "{:>9.2e}"),
    ("inner_crit", "{:>10.3e}"),
    ("prim_err", "{:>10.3e}"),
    ("dual_err", "{:>10.3e}"),
    ("cost", "{:>11.4e}"),
    ("merit", "{:>11.4e}"),
    ("aliter", "{:>6d}"),
    ("mu", "{:>9.2e}"),
)


class Logger:
    def __init__(self, active: bool = True):
        self.active = active
        self.cols: list[tuple[str, str]] = []

    def add_column(self, name: str, fmt: str = "{:>10.3e}"):
        self.cols.append((name, fmt))

    def print_headline(self):
        if not self.active:
            return
        print(" | ".join(f"{name:>10s}" for name, _ in self.cols))

    def log(self, **values):
        if not self.active:
            return
        cells = []
        for name, fmt in self.cols:
            v = values.get(name)
            cells.append(fmt.format(v) if v is not None else " " * 10)
        print(" | ".join(cells))

    def finish(self, conv: bool):
        if not self.active:
            return
        print("Successfully converged." if conv else "Convergence failure.")


# reference default column set (utils/logger.hpp:22-28):
# iter/alpha/inner_crit/prim_err/dual_err/preg/cost/dphi0/merit/aliter/mu
_ROW_KEYS = (
    ("iter", "{:>5d}"),
    ("al_iter", "{:>7d}"),
    ("alpha", "{:>9.2e}"),
    ("prim_err", "{:>10.3e}"),
    ("dual_err", "{:>10.3e}"),
    ("inner_crit", "{:>10.3e}"),
    ("preg", "{:>9.2e}"),
    ("dphi0", "{:>10.3e}"),
    ("cost", "{:>11.4e}"),
    ("merit", "{:>11.4e}"),
    ("mu", "{:>9.2e}"),
)


def log_row(trace: dict, header: bool = False):
    """Print one columnar trace row (reference Logger row format,
    ``utils/logger.hpp:22-56``); used by the in-jit ``verbose`` path of the
    solvers via ``jax.debug.callback``."""
    def width(fmt):
        m = re.search(r">(\d+)", fmt)
        return int(m.group(1)) if m else 10

    if header:
        print(" | ".join(
            f"{name:>{width(fmt)}s}" for name, fmt in _ROW_KEYS
        ))
    cells = []
    for name, fmt in _ROW_KEYS:
        v = trace.get(name)
        cells.append(fmt.format(v) if v is not None else " " * width(fmt))
    print(" | ".join(cells))


def print_history(history, num_iters=None):
    """Pretty-print a ProxDDP history array
    [prim, dual, inner_crit, cost, merit, mu, al_iter, alpha]."""
    import numpy as np

    h = np.asarray(history)
    n = int(num_iters) if num_iters is not None else h.shape[0]
    for i in range(min(n, h.shape[0])):
        log_row(
            {
                "iter": i + 1,
                "al_iter": int(h[i, 6]) + 1,
                "alpha": float(h[i, 7]) if h.shape[1] > 7 else None,
                "prim_err": h[i, 0],
                "dual_err": h[i, 1],
                "inner_crit": h[i, 2],
                "cost": h[i, 3],
                "merit": h[i, 4],
                "mu": h[i, 5],
            },
            header=(i == 0),
        )
