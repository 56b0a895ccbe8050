"""dealii_adapter_tpu — a TPU-native coupled structural-mechanics framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the preCICE
deal.II adapter (reference: precice/dealii-adapter): linear elastodynamics
with one-step theta time integration and finite-strain compressible
Neo-Hookean elasticity with Newmark-beta dynamics and Newton-Raphson, both
coupled to other solvers through a preCICE-compatible adapter layer.

Architecture (TPU-first, not a port):
  * structured quad/hex meshes as index arrays (mesh/)
  * tensor-product Lagrange FE tabulations of arbitrary degree (fem/)
  * batched matrix-free element operators: the whole stiffness/mass action
    is gather -> one MXU matmul -> transpose-gather (ops/)
  * matrix-free preconditioned CG and Newton-Krylov in lax.while_loop
    (solvers/, models/)
  * pjit/shard_map SPMD over a jax.sharding.Mesh (parallel/)
  * host-side coupling adapter with implicit-coupling checkpoint/rollback
    (adapter/), libprecice stays on host
  * VTK Lagrange-cell output, section timers (utils/)

Everything numerical defaults to float64 (the reference solves to 1e-10
absolute CG tolerance); x64 is enabled at import time.
"""

import jax

# The reference solvers (linear_elasticity.cc:542-543, Newton tolerances
# 1e-9/1e-10) require double precision to reach their convergence contracts.
jax.config.update("jax_enable_x64", True)

from .config import AllParameters, parse_prm  # noqa: E402,F401
from .time_handler import Time  # noqa: E402,F401

__version__ = "0.1.0"
