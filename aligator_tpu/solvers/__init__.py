"""solvers — trajectory-optimization algorithms (reference layer 4)."""

from .proxddp import ProxDDPConfig, ProxDDPResults, solve

__all__ = ["ProxDDPConfig", "ProxDDPResults", "solve"]
