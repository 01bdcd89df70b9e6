"""trajopt_tpu: a TPU-native constrained trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
TrajectoryOptimization.jl (problem interface), RobotDynamics.jl (models,
integrators), and Altro.jl (AL-iLQR / ALTRO solver), built for batched
solves on TPU meshes.  See SURVEY.md for the layer map and reference
citations.
"""

from .cones import (
    Cone,
    Equality,
    Inequality,
    IdentityCone,
    NegativeOrthant,
    PositiveOrthant,
    SecondOrderCone,
    ZeroCone,
    cone_status,
    dualcone,
    in_cone,
    projection,
    projection_hessian,
    projection_jacobian,
)
from .costs import (
    CostExpansion,
    DiagonalCost,
    DiagonalLieCost,
    DiagonalQuatCost,
    ErrorQuadratic,
    GenericCost,
    LQRCost,
    QuadraticCost,
    QuatLQRCost,
    invert,
)
from .objective import LQRObjective, Objective, TrackingObjective, update_trajectory
from .dynamics import (
    DiscreteModel,
    Euler,
    ImplicitMidpoint,
    Model,
    RK3,
    RK4,
    discretize,
    implicit_midpoint_residual,
    linearize,
)
from .constraints import (
    BoundConstraint,
    CircleConstraint,
    CollisionConstraint,
    ControlBound,
    GoalConstraint,
    IndexedConstraint,
    LinearConstraint,
    NormConstraint,
    QuatVecEq,
    SphereConstraint,
    StateBound,
    is_bound,
    sense,
)
from .constraint_list import ConstraintList, num_constraints
from .problem import Problem
from .trajectories import KnotPoint, SampledTrajectory, Traj
from .api import (
    add_constraint,
    control_dim,
    controls,
    cost,
    get_constraints,
    get_model,
    get_objective,
    get_trajectory,
    gettimes,
    horizonlength,
    initial_controls,
    initial_states,
    initial_trajectory,
    max_violation,
    rollout,
    set_goal_state,
    set_initial_state,
    state_dim,
    states,
)
from .nlp import TrajOptNLP, TrajData, JacobianStructure, solve_nlp
from .hybrid import HybridModel, HybridProblem, pad_costs, pad_constraints
from .dynamics import dims

__version__ = "0.1.0"
