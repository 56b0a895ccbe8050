"""Dense direct solver for small validation problems.

Stands in for the reference's UMFPACK path (`linear_elasticity.cc:556-563`,
`nonlinear_elasticity.cc:1192-1200`). The system matrices on this code path
are SPD (mass + stiffness / Newton tangent), so a single device-side
Cholesky factorization is computed at setup and reused every step.
Intended for n_dofs up to a few tens of thousands; large runs use CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DenseCholesky:
    def __init__(self, A: np.ndarray):
        self.n = A.shape[0]
        self._chol = jnp.linalg.cholesky(jnp.asarray(A))

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        shape = b.shape
        x = jax.scipy.linalg.cho_solve((self._chol, True), b.reshape(self.n))
        return x.reshape(shape)
