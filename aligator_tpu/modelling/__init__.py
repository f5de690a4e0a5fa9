"""modelling — concrete spaces, dynamics, costs, residuals (reference layer 3)."""

from .spaces.se2 import SE2, SO2
from .spaces.se3 import SE3, SO3
from .dynamics.ode import (
    ContinuousDynamics,
    ODE,
    IntegratorEuler,
    IntegratorMidpoint,
    IntegratorRK2,
    IntegratorRK4,
    IntegratorSemiImplEuler,
    LinearODE,
)
from . import multibody

__all__ = [
    "SE2",
    "SO2",
    "SE3",
    "SO3",
    "ContinuousDynamics",
    "ODE",
    "LinearODE",
    "IntegratorEuler",
    "IntegratorMidpoint",
    "IntegratorSemiImplEuler",
    "IntegratorRK2",
    "IntegratorRK4",
    "multibody",
]
