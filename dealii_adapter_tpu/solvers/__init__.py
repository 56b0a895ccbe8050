from .cg import cg_solve, chebyshev_preconditioner, jacobi_preconditioner  # noqa: F401
from .direct import DenseCholesky  # noqa: F401
