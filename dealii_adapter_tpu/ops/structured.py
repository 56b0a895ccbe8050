"""Structured-grid element operators: gather-free patch/stencil formulation.

The meshes of this framework are lexicographic tensor grids
(mesh/generator.py), so a nodal field `(n_nodes, dim)` is a dense grid
`(nz, ny, nx, dim)` (x fastest) and cell-local values are *strided patches*
of that grid: cell (cx, cy) local node (a, b) is `grid[cy*p + b, cx*p + a]`.
Cell gather therefore becomes `(p+1)^dim` static strided slices, and the
transpose scatter-add becomes `(p+1)^dim` interior-padded adds
(`lax.pad` with interior padding p-1) — **no index arrays, no gathers, no
scatters**. XLA sees only slices, one big MXU matmul, pads and adds, which
it fuses and tiles far better than gather/scatter chains; HBM traffic is
regular and prefetchable.

This is the TPU-idiomatic replacement for both deal.II sparse assembly and
this package's own transpose-gather-plan path (`element_ops.py`), kept as
an alternative backend (`AllParameters.element_backend`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace


def _grid_shape(space: DofSpace) -> Tuple[int, ...]:
    """Nodes per axis, slowest-varying first (z, y, x) for reshaping the
    lexicographic (x fastest) node vector."""
    mesh = space.mesh
    n_ax = [mesh.reps[d] * mesh.degree + 1 for d in range(mesh.dim)]
    return tuple(reversed(n_ax))


def _cells_shape(space: DofSpace) -> Tuple[int, ...]:
    return tuple(reversed(space.mesh.reps))


def extract_cell_patches(u_grid: jnp.ndarray, p: int, reps_rev) -> jnp.ndarray:
    """(..grid.., dim) -> (n_cells, npc, dim) via static strided slices.

    `reps_rev` is cells per axis, slowest first. Local node order matches
    the lexicographic tabulation (x fastest)."""
    dim = u_grid.shape[-1]
    ndim = len(reps_rev)
    patches = []
    # local offsets, x fastest => iterate slowest (last grid axis = x) last
    if ndim == 2:
        ncy, ncx = reps_rev
        for b in range(p + 1):
            for a in range(p + 1):
                sl = jax.lax.slice(
                    u_grid,
                    (b, a, 0),
                    (b + (ncy - 1) * p + 1, a + (ncx - 1) * p + 1, dim),
                    (p, p, 1),
                )
                patches.append(sl.reshape(ncy * ncx, dim))
        npc = (p + 1) ** 2
    else:
        ncz, ncy, ncx = reps_rev
        for c in range(p + 1):
            for b in range(p + 1):
                for a in range(p + 1):
                    sl = jax.lax.slice(
                        u_grid,
                        (c, b, a, 0),
                        (
                            c + (ncz - 1) * p + 1,
                            b + (ncy - 1) * p + 1,
                            a + (ncx - 1) * p + 1,
                            dim,
                        ),
                        (p, p, p, 1),
                    )
                    patches.append(sl.reshape(ncz * ncy * ncx, dim))
        npc = (p + 1) ** 3
    # (npc, n_cells, dim) -> (n_cells, npc, dim)
    return jnp.stack(patches, axis=1)


def overlap_add(rcell: jnp.ndarray, p: int, reps_rev, grid_shape) -> jnp.ndarray:
    """(n_cells, npc, dim) -> (..grid.., dim): the exact adjoint of
    `extract_cell_patches`, as interior-padded adds."""
    dim = rcell.shape[-1]
    ndim = len(reps_rev)
    out = jnp.zeros(tuple(grid_shape) + (dim,), dtype=rcell.dtype)
    zero = jnp.zeros((), dtype=rcell.dtype)
    slot = 0
    if ndim == 2:
        ncy, ncx = reps_rev
        ny, nx = grid_shape
        for b in range(p + 1):
            for a in range(p + 1):
                block = rcell[:, slot, :].reshape(ncy, ncx, dim)
                padded = jax.lax.pad(
                    block,
                    zero,
                    (
                        (b, ny - b - (ncy - 1) * p - 1, p - 1),
                        (a, nx - a - (ncx - 1) * p - 1, p - 1),
                        (0, 0, 0),
                    ),
                )
                out = out + padded
                slot += 1
    else:
        ncz, ncy, ncx = reps_rev
        nz, ny, nx = grid_shape
        for c in range(p + 1):
            for b in range(p + 1):
                for a in range(p + 1):
                    block = rcell[:, slot, :].reshape(ncz, ncy, ncx, dim)
                    padded = jax.lax.pad(
                        block,
                        zero,
                        (
                            (c, nz - c - (ncz - 1) * p - 1, p - 1),
                            (b, ny - b - (ncy - 1) * p - 1, p - 1),
                            (a, nx - a - (ncx - 1) * p - 1, p - 1),
                            (0, 0, 0),
                        ),
                    )
                    out = out + padded
                    slot += 1
    return out


def extract_cell_patches_T(u_grid: jnp.ndarray, p: int, reps_rev) -> jnp.ndarray:
    """(..grid.., dim) -> (dim, npc, n_cells): same strided slicing as
    `extract_cell_patches` but with the *cell* index trailing. On TPU the
    last two dims of a buffer are tiled to (sublane, 128); putting the huge
    cell axis last keeps padding negligible, whereas the (n_cells, npc, dim)
    layout tiles the tiny (npc, dim) tail and can inflate HBM footprint by
    more than an order of magnitude at ~1M DoF."""
    dim = u_grid.shape[-1]
    ndim = len(reps_rev)
    n_cells = 1
    for r in reps_rev:
        n_cells *= r
    # patches[slot][d]: (n_cells,) — every intermediate is 1D so no stack
    # ever materializes a badly-tiled (.., npc, dim) tail
    patches = []
    if ndim == 2:
        ncy, ncx = reps_rev
        for b in range(p + 1):
            for a in range(p + 1):
                sl = jax.lax.slice(
                    u_grid,
                    (b, a, 0),
                    (b + (ncy - 1) * p + 1, a + (ncx - 1) * p + 1, dim),
                    (p, p, 1),
                )
                patches.append(
                    [sl[..., d].reshape(n_cells) for d in range(dim)]
                )
    else:
        ncz, ncy, ncx = reps_rev
        for c in range(p + 1):
            for b in range(p + 1):
                for a in range(p + 1):
                    sl = jax.lax.slice(
                        u_grid,
                        (c, b, a, 0),
                        (
                            c + (ncz - 1) * p + 1,
                            b + (ncy - 1) * p + 1,
                            a + (ncx - 1) * p + 1,
                            dim,
                        ),
                        (p, p, p, 1),
                    )
                    patches.append(
                        [sl[..., d].reshape(n_cells) for d in range(dim)]
                    )
    rows = [
        jnp.stack([pt[d] for pt in patches], axis=0) for d in range(dim)
    ]  # dim x (npc, n_cells)
    return jnp.stack(rows, axis=0)


def overlap_add_T(rt: jnp.ndarray, p: int, reps_rev, grid_shape) -> jnp.ndarray:
    """(dim, npc, n_cells) -> (..grid.., dim): adjoint of
    `extract_cell_patches_T`. Accumulates one scalar lattice per component
    (all big intermediates keep the large axes trailing), stacking into the
    canonical (..grid.., dim) nodal layout only at the end."""
    dim, npc, n_cells = rt.shape
    ndim = len(reps_rev)
    comps = []
    zero = jnp.zeros((), dtype=rt.dtype)
    for d in range(dim):
        out = jnp.zeros(tuple(grid_shape), dtype=rt.dtype)
        slot = 0
        if ndim == 2:
            ncy, ncx = reps_rev
            ny, nx = grid_shape
            for b in range(p + 1):
                for a in range(p + 1):
                    block = rt[d, slot].reshape(ncy, ncx)
                    out = out + jax.lax.pad(
                        block,
                        zero,
                        (
                            (b, ny - b - (ncy - 1) * p - 1, p - 1),
                            (a, nx - a - (ncx - 1) * p - 1, p - 1),
                        ),
                    )
                    slot += 1
        else:
            ncz, ncy, ncx = reps_rev
            nz, ny, nx = grid_shape
            for c in range(p + 1):
                for b in range(p + 1):
                    for a in range(p + 1):
                        block = rt[d, slot].reshape(ncz, ncy, ncx)
                        out = out + jax.lax.pad(
                            block,
                            zero,
                            (
                                (c, nz - c - (ncz - 1) * p - 1, p - 1),
                                (b, ny - b - (ncy - 1) * p - 1, p - 1),
                                (a, nx - a - (ncx - 1) * p - 1, p - 1),
                            ),
                        )
                        slot += 1
        comps.append(out)
    return jnp.stack(comps, axis=-1)


@dataclasses.dataclass(frozen=True)
class StructuredOperator:
    """Drop-in replacement for `AssembledOperator` (same call surface) with
    the gather-free formulation, in TPU layout: patches are held as
    (dim, npc, n_cells) with the huge cell axis trailing, and the element
    matrix is applied as one (edofs, edofs) @ (edofs, n_cells) MXU matmul.
    `EpT` is the element matrix transposed AND permuted to component-major
    dof order (index = d * npc + n) so the patch tensor flattens into the
    matmul operand with zero data movement. Requires p >= 1 (any degree)."""

    EpT: jnp.ndarray  # (edofs, edofs), component-major rows/cols
    dim: int
    p: int
    reps_rev: Tuple[int, ...]
    grid_shape: Tuple[int, ...]
    # f32 matmuls on TPU default to one bf16 MXU pass (~3e-3 relative
    # error) — "highest" forces true-f32 products. Krylov operators need it
    # (a CG operator at bf16 precision caps the attainable residual);
    # preconditioner-internal ops (MG smoothing) pass "default" for speed.
    precision: str = "highest"

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        edofs = self.EpT.shape[0]
        u_grid = u.reshape(self.grid_shape + (dim,))
        ut = extract_cell_patches_T(u_grid, self.p, self.reps_rev)
        _, npc, n_cells = ut.shape
        # the precision override only applies to f32 (f64 matmuls follow the
        # backend's emulation path; forcing a precision there can break or
        # slow the experimental TPU f64 pipeline)
        prec = self.precision if ut.dtype == jnp.float32 else None
        r = jnp.dot(
            self.EpT, ut.reshape(edofs, n_cells),
            preferred_element_type=ut.dtype,
            precision=prec,
        ).reshape(dim, npc, n_cells)
        out = overlap_add_T(r, self.p, self.reps_rev, self.grid_shape)
        return out.reshape(-1, dim)

    def diagonal(self) -> jnp.ndarray:
        npc = self.EpT.shape[0] // self.dim
        n_cells = int(np.prod(self.reps_rev))
        d = jnp.diag(self.EpT).reshape(self.dim, npc)
        dcell = jnp.broadcast_to(d[:, :, None], (self.dim, npc, n_cells))
        out = overlap_add_T(dcell, self.p, self.reps_rev, self.grid_shape)
        return out.reshape(-1, self.dim)


def make_structured_operator(
    space: DofSpace, E: np.ndarray, dtype=jnp.float64, precision: str = "highest"
) -> StructuredOperator:
    dim = space.dim
    npc = E.shape[0] // dim
    # node-major (n*dim + d) -> component-major (d*npc + n) permutation
    jidx = np.arange(dim * npc)
    jidx = (jidx % npc) * dim + (jidx // npc)
    Ep = np.asarray(E)[np.ix_(jidx, jidx)]
    return StructuredOperator(
        EpT=jnp.asarray(Ep.T, dtype=dtype),
        dim=dim,
        p=space.mesh.degree,
        reps_rev=_cells_shape(space),
        grid_shape=_grid_shape(space),
        precision=precision,
    )
