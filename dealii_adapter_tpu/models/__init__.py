from .linear_elasticity import LinearElastodynamics, LinearState  # noqa: F401
from .material import NeoHookean, kinematics  # noqa: F401
from .nonlinear_elasticity import (  # noqa: F401
    NewtonInfo,
    NonlinearElasticity,
    NonlinearState,
)
