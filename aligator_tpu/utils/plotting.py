"""Plotting helpers (counterpart of
``bindings/python/aligator/utils/plotting.py``). Matplotlib is optional."""

from __future__ import annotations

import numpy as np


def plot_convergence(history, ax=None, num_iters=None):
    """Plot primal/dual infeasibility traces from a recorded history array."""
    import matplotlib.pyplot as plt

    h = np.asarray(history)
    if num_iters is not None:
        h = h[: int(num_iters)]
    if ax is None:
        _, ax = plt.subplots()
    it = np.arange(1, h.shape[0] + 1)
    ax.semilogy(it, np.maximum(h[:, 0], 1e-16), marker=".", label="prim. err")
    ax.semilogy(it, np.maximum(h[:, 1], 1e-16), marker=".", label="dual err")
    ax.set_xlabel("iteration")
    ax.legend()
    return ax


def plot_controls_traj(times, us, ax=None, labels=None):
    import matplotlib.pyplot as plt

    us = np.asarray(us)
    if ax is None:
        _, ax = plt.subplots()
    for j in range(us.shape[1]):
        lbl = labels[j] if labels else f"u[{j}]"
        ax.step(times[: us.shape[0]], us[:, j], where="post", label=lbl)
    ax.set_xlabel("time")
    ax.legend()
    return ax


def plot_velocity_traj(times, vs, ax=None):
    import matplotlib.pyplot as plt

    vs = np.asarray(vs)
    if ax is None:
        _, ax = plt.subplots()
    for j in range(vs.shape[1]):
        ax.plot(times[: vs.shape[0]], vs[:, j], label=f"v[{j}]")
    ax.set_xlabel("time")
    ax.legend()
    return ax
