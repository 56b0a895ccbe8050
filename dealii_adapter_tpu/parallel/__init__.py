"""SPMD parallelism: sharded element batches over a jax device mesh.

The reference parallelizes assembly with shared-memory TBB WorkStream
(`nonlinear_elasticity.cc:1078-1084`) and stubs MPI to a single rank
(`adapter.h:152-154`). The TPU-native equivalent is domain decomposition of
the *cell batch* across a `jax.sharding.Mesh`: each device owns a
contiguous block of cells, applies the element kernel locally, reduces into
a node-window buffer, and a single `psum` over the mesh axis produces the
replicated global nodal vector. Collectives ride ICI; nothing crosses the
host boundary inside the solver loop.
"""

from .partition import CellPartition, make_device_mesh
from .sharded_ops import ShardedOperator, sharded_cellwise_reduction

__all__ = [
    "CellPartition",
    "make_device_mesh",
    "ShardedOperator",
    "sharded_cellwise_reduction",
]
