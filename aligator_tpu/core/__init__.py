"""core — problem-modeling abstractions (reference layer 2).

Manifolds, stage functions, costs, dynamics, constraint sets, stage models
and trajectory problems. See SURVEY.md §2.3.
"""

from .costs import (
    ConstantCost,
    Cost,
    CostStack,
    LogResidualCost,
    QuadraticControlCost,
    QuadraticCost,
    QuadraticResidualCost,
    QuadraticStateCost,
    RelaxedLogBarrierCost,
)
from .dynamics import ExplicitDynamics, LinearDiscreteDynamics
from .functions import (
    ControlBoxFunction,
    ControlErrorResidual,
    FunctionSlice,
    GatedFunction,
    LinearFunction,
    LinearFunctionComposition,
    StageFunction,
    StateErrorResidual,
)
from .manifolds import CartesianProduct, Manifold, TangentBundle, VectorSpace
from .problem import (
    ProblemData,
    StageModel,
    TrajOptProblem,
    compute_derivatives,
    evaluate,
    make_problem,
    make_stage,
    replicate_stage,
    stack_stages,
)
from .sets import (
    BoxConstraint,
    ConstraintSet,
    ConstraintSetProduct,
    EqualityConstraint,
    L1Penalty,
    NegativeOrthant,
)

__all__ = [
    "Cost",
    "ConstantCost",
    "CostStack",
    "LogResidualCost",
    "QuadraticCost",
    "QuadraticControlCost",
    "QuadraticResidualCost",
    "QuadraticStateCost",
    "RelaxedLogBarrierCost",
    "ExplicitDynamics",
    "LinearDiscreteDynamics",
    "StageFunction",
    "StateErrorResidual",
    "ControlErrorResidual",
    "ControlBoxFunction",
    "FunctionSlice",
    "GatedFunction",
    "LinearFunction",
    "LinearFunctionComposition",
    "Manifold",
    "VectorSpace",
    "CartesianProduct",
    "TangentBundle",
    "StageModel",
    "TrajOptProblem",
    "ProblemData",
    "make_stage",
    "make_problem",
    "replicate_stage",
    "stack_stages",
    "evaluate",
    "compute_derivatives",
    "ConstraintSet",
    "ConstraintSetProduct",
    "EqualityConstraint",
    "NegativeOrthant",
    "BoxConstraint",
    "L1Penalty",
]
