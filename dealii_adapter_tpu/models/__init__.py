from .linear_elasticity import LinearElastodynamics, LinearState  # noqa: F401
