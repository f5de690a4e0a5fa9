"""solvers — trajectory-optimization algorithms (reference layer 4)."""

from . import fddp, proxddp, sensitivity
from .fddp import FDDPConfig, FDDPResults
from .proxddp import ProxDDPConfig, ProxDDPResults, solve
from .sensitivity import solve_with_sensitivities, theta_sensitivities

__all__ = [
    "ProxDDPConfig",
    "ProxDDPResults",
    "solve",
    "FDDPConfig",
    "FDDPResults",
    "fddp",
    "proxddp",
    "sensitivity",
    "theta_sensitivities",
    "solve_with_sensitivities",
]
