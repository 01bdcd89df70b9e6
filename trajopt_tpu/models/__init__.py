"""Canonical models (the RobotZoo.jl role, SURVEY.md scope note).

These are the models the reference's tests and examples exercise
(test/test_models.jl:1, examples/*.ipynb), re-implemented as pure JAX vector
fields.
"""
from .double_integrator import DoubleIntegrator
from .pendulum import Pendulum
from .cartpole import Cartpole
from .dubins import DubinsCar
from .quadrotor import Quadrotor
from .rocket import Rocket

__all__ = [
    "DoubleIntegrator",
    "Pendulum",
    "Cartpole",
    "DubinsCar",
    "Quadrotor",
    "Rocket",
]
