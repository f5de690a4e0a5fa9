"""modelling — concrete spaces, dynamics, costs, residuals (reference layer 3)."""

from .spaces.se2 import SE2, SO2
from .dynamics.ode import (
    ODE,
    IntegratorEuler,
    IntegratorRK2,
    IntegratorRK4,
    IntegratorSemiImplEuler,
    LinearODE,
)

__all__ = [
    "SE2",
    "SO2",
    "ODE",
    "LinearODE",
    "IntegratorEuler",
    "IntegratorSemiImplEuler",
    "IntegratorRK2",
    "IntegratorRK4",
]
