"""Columnar solver-trace logger.

Counterpart of the reference's fixed-width table logger
(``include/aligator/utils/logger.hpp:22-56``). Host-side: feed it a recorded
history array (``ProxDDPResults.history``) or add rows manually.
"""

from __future__ import annotations

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


def print_history(history, num_iters=None):
    """Pretty-print a ProxDDP history array
    [prim, dual, inner_crit, cost, merit, mu, al_iter]."""
    import numpy as np

    h = np.asarray(history)
    n = int(num_iters) if num_iters is not None else h.shape[0]
    log = Logger()
    for name in ("iter", "prim_err", "dual_err", "inner_crit", "cost", "merit", "mu", "aliter"):
        fmt = "{:>5d}" if name in ("iter", "aliter") else (
            "{:>11.4e}" if name in ("cost", "merit") else "{:>10.3e}"
        )
        log.add_column(name, fmt)
    log.print_headline()
    for i in range(min(n, h.shape[0])):
        log.log(
            iter=i + 1,
            prim_err=h[i, 0],
            dual_err=h[i, 1],
            inner_crit=h[i, 2],
            cost=h[i, 3],
            merit=h[i, 4],
            mu=h[i, 5],
            aliter=int(h[i, 6]) + 1,
        )
