"""SPMD element-kernel reductions over a device mesh.

`sharded_cellwise_reduction` is the one communication pattern of the whole
framework: every device applies a per-cell kernel to its cell block, reduces
cell-local values into its contiguous node window (gather-plan, no scatter),
places the window in a zero buffer, and `psum`s over the mesh axis. The
result is the replicated global nodal vector — exactly what the matrix-free
solvers consume. This is the TPU-native replacement for the reference's
TBB-serialized `copy_local_to_global` (`nonlinear_elasticity.cc:760-774`).

All functions here are differentiable (psum/gather/dynamic_update_slice have
exact linearizations), so `jax.linearize` of a sharded residual yields the
sharded consistent-tangent action for Newton-Krylov.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .partition import CellPartition

AXIS = "shards"


def sharded_cellwise_reduction(
    part: CellPartition,
    mesh: Mesh,
    local_kernel: Callable,
    *,
    has_min: bool = False,
    axis: str = AXIS,
):
    """Build `apply(u, *replicated_args) -> (n_nodes, dim) nodal sums`.

    `local_kernel(u, cells, *replicated_args)` runs per device on its
    `(cpd, npc)` cell block and must return flattened per-cell values of
    shape `(cpd * npc, dim)` (and, if `has_min`, a scalar that is
    min-reduced across devices — used for the det F > 0 monitor).
    Padded cells' values are never gathered by the plan, so kernels need not
    mask them.
    """
    cells_d = jnp.asarray(part.cells)
    plans_d = jnp.asarray(part.plans)
    offs_d = jnp.asarray(part.offsets)
    n_nodes, n_pad = part.n_nodes, part.n_nodes_pad

    def local(u, cells, plan, off, *args):
        cells, plan, off = cells[0], plan[0], off[0]
        out = local_kernel(u, cells, *args)
        rflat, mn = out if has_min else (out, None)
        dim = rflat.shape[-1]
        flat = jnp.concatenate(
            [rflat, jnp.zeros((1, dim), dtype=rflat.dtype)], axis=0
        )
        rloc = flat[plan].sum(axis=1)  # (wlen, dim) window sums
        buf = jnp.zeros((n_pad, dim), dtype=rflat.dtype)
        buf = jax.lax.dynamic_update_slice(
            buf, rloc, (off, jnp.zeros((), dtype=off.dtype))
        )
        buf = jax.lax.psum(buf, axis)
        if has_min:
            # monitor value only (det F > 0 guard) — never differentiated;
            # stop_gradient keeps jax.linearize from needing a pmin JVP rule
            return buf, jax.lax.pmin(jax.lax.stop_gradient(mn), axis)
        return buf

    def apply(u, *args):
        in_specs = (P(), P(axis), P(axis), P(axis)) + tuple(P() for _ in args)
        out_specs = (P(), P()) if has_min else P()
        f = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )
        res = f(u, cells_d, plans_d, offs_d, *args)
        if has_min:
            return res[0][:n_nodes], res[1]
        return res[:n_nodes]

    return apply


@dataclasses.dataclass(frozen=True)
class ShardedOperator:
    """SPMD matrix-free action of a constant element matrix — the sharded
    counterpart of `ops.element_ops.AssembledOperator` with an identical
    call interface, so solvers and models are agnostic to the parallel
    layout."""

    part: CellPartition
    mesh: Mesh
    E: jnp.ndarray  # (edofs, edofs)
    dim: int

    def __post_init__(self):
        E = self.E
        dim = self.dim

        def matvec_kernel(u, cells):
            cpd, npc = cells.shape
            ucell = u[cells].reshape(cpd, npc * dim)
            # "highest": true-f32 products (TPU default is one bf16 MXU
            # pass, too coarse for a Krylov operator); f64 follows the
            # backend's own emulation path untouched
            prec = "highest" if ucell.dtype == jnp.float32 else None
            r = jnp.dot(
                ucell, E,
                preferred_element_type=ucell.dtype, precision=prec,
            )
            return r.reshape(cpd * npc, dim)

        def diag_kernel(u, cells):
            cpd, npc = cells.shape
            d = jnp.diag(E).reshape(npc, dim).astype(u.dtype)
            dcell = jnp.broadcast_to(d, (cpd, npc, dim))
            return dcell.reshape(cpd * npc, dim)

        object.__setattr__(
            self,
            "_matvec",
            sharded_cellwise_reduction(self.part, self.mesh, matvec_kernel),
        )
        object.__setattr__(
            self,
            "_diag",
            sharded_cellwise_reduction(self.part, self.mesh, diag_kernel),
        )

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._matvec(u)

    def diagonal(self) -> jnp.ndarray:
        n_nodes = self.part.n_nodes
        u = jnp.ones((n_nodes, self.dim), dtype=self.E.dtype)
        return self._diag(u)


def make_sharded_operator(
    space, E: np.ndarray, mesh: Mesh, dtype=jnp.float64
) -> ShardedOperator:
    part = CellPartition.create(space.cells, space.n_nodes, mesh.devices.size)
    return ShardedOperator(
        part=part, mesh=mesh, E=jnp.asarray(E, dtype=dtype), dim=space.dim
    )
