"""multibody — rigid-body kinematics/dynamics (role of Pinocchio in the
reference)."""

from .model import (
    RobotModel,
    aba,
    center_of_mass,
    forward_kinematics,
    frame_placement,
    frame_velocity,
    make_model,
    mass_matrix,
    nonlinear_effects,
    rnea,
)
from . import geometry, mjcf, robots, urdf
from .mjcf import load_mjcf
from .urdf import load_urdf

__all__ = [
    "geometry",
    "mjcf",
    "urdf",
    "load_mjcf",
    "load_urdf",
    "RobotModel",
    "make_model",
    "forward_kinematics",
    "frame_placement",
    "frame_velocity",
    "center_of_mass",
    "rnea",
    "aba",
    "mass_matrix",
    "nonlinear_effects",
    "robots",
]
