from .tabulation import (  # noqa: F401
    gauss_legendre,
    gauss_lobatto_points,
    lagrange_basis,
    Tabulation,
    tabulate,
)
from .dofspace import DofSpace  # noqa: F401
