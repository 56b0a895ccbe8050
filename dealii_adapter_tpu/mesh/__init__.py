from .generator import (  # noqa: F401
    StructuredMesh,
    subdivided_hyper_rectangle,
    make_scenario_grid,
    LINEAR_IDS,
    NONLINEAR_IDS,
)
