"""solvers — trajectory-optimization algorithms (reference layer 4)."""

from . import fddp, proxddp
from .fddp import FDDPConfig, FDDPResults
from .proxddp import ProxDDPConfig, ProxDDPResults, solve

__all__ = [
    "ProxDDPConfig",
    "ProxDDPResults",
    "solve",
    "FDDPConfig",
    "FDDPResults",
    "fddp",
    "proxddp",
]
