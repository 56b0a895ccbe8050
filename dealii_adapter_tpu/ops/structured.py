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


def _phase_view(u_grid: jnp.ndarray, p: int, reps_rev):
    """Reshape the lattice axes into (cells+1, phase) pairs: axis of
    n = nc*p + 1 nodes -> (nc+1, p) with node i at [i // p, i % p].

    Stride-p patch slices of the lattice become *contiguous* slices of
    this view: offset a in [0, p] is phase a % p, start a // p. This kills
    the two TPU-hostile access patterns of the naive formulation — 27
    stride-p slices on extraction and 81 interior-dilated `lax.pad`s on
    the transpose — replacing them with one boundary pad + reshape per
    axis and contiguous windows (measured: the dominant cost of the f64
    extract/overlap pair at 1M DoF was these dilated ops)."""
    ndim = len(reps_rev)
    out = u_grid
    # process lattice axes last-to-first so earlier axis indices stay
    # valid; each phase axis is parked at the end, so the trailing phase
    # axes end up in REVERSED lattice order: (.., ph_{ndim-1}, .., ph_0)
    for ax in range(ndim - 1, -1, -1):
        nc = reps_rev[ax]
        n = out.shape[ax]
        pad = (nc + 1) * p - n  # = p - 1
        cfg = [(0, 0, 0)] * out.ndim
        cfg[ax] = (0, pad, 0)
        out = jax.lax.pad(out, jnp.zeros((), out.dtype), cfg)
        shape = out.shape[:ax] + (nc + 1, p) + out.shape[ax + 1 :]
        out = out.reshape(shape)
        out = jnp.moveaxis(out, ax + 1, -1)
    return out  # (nc_0+1, .., nc_{ndim-1}+1, ..orig trailing.., ph_{ndim-1}, .., ph_0)


def extract_cell_patches_T(u_grid: jnp.ndarray, p: int, reps_rev) -> jnp.ndarray:
    """(..grid.., dim) -> (dim, npc, n_cells): same strided slicing as
    `extract_cell_patches` but with the *cell* index trailing. On TPU the
    last two dims of a buffer are tiled to (sublane, 128); putting the huge
    cell axis last keeps padding negligible, whereas the (n_cells, npc, dim)
    layout tiles the tiny (npc, dim) tail and can inflate HBM footprint by
    more than an order of magnitude at ~1M DoF.

    For p >= 2 the patches are taken through the contiguous phase view
    (see `_phase_view`) instead of stride-p slices."""
    if p >= 2:
        return _extract_cell_patches_T_ph(u_grid, p, reps_rev)
    return _extract_cell_patches_T_strided(u_grid, p, reps_rev)


def _extract_cell_patches_T_ph(u_grid, p, reps_rev):
    dim = u_grid.shape[-1]
    ndim = len(reps_rev)
    n_cells = int(np.prod(reps_rev))
    ph = _phase_view(u_grid, p, reps_rev)
    # ph axes: (nc_0+1, .., nc_{n-1}+1, dim, ph_0, .., ph_{n-1})
    patches = []
    offs = (
        [(b, a) for b in range(p + 1) for a in range(p + 1)]
        if ndim == 2
        else [
            (c, b, a)
            for c in range(p + 1)
            for b in range(p + 1)
            for a in range(p + 1)
        ]
    )
    for off in offs:
        idx = []
        for ax, (o, nc) in enumerate(zip(off, reps_rev)):
            idx.append(slice(o // p, o // p + nc))
        sel = ph[tuple(idx)]  # (nc_0, .., nc_{n-1}, dim, p, .., p)
        # trailing phase axes are in reversed lattice order (_phase_view)
        sel = sel[(...,) + tuple(o % p for o in reversed(off))]
        patches.append([sel[..., d].reshape(n_cells) for d in range(dim)])
    rows = [
        jnp.stack([pt[d] for pt in patches], axis=0) for d in range(dim)
    ]
    return jnp.stack(rows, axis=0)


def _extract_cell_patches_T_strided(u_grid: jnp.ndarray, p: int, reps_rev) -> jnp.ndarray:
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
    `extract_cell_patches_T`. For p >= 2, accumulates per phase class with
    boundary-only pads and interleaves once per axis (the exact adjoint of
    the phase-view extraction); for p = 1, interior-dilated pads."""
    if p >= 2:
        return _overlap_add_T_ph(rt, p, reps_rev, grid_shape)
    return _overlap_add_T_dilated(rt, p, reps_rev, grid_shape)


def _overlap_add_T_ph(rt: jnp.ndarray, p: int, reps_rev, grid_shape) -> jnp.ndarray:
    dim, npc, n_cells = rt.shape
    ndim = len(reps_rev)
    zero = jnp.zeros((), dtype=rt.dtype)
    offs = (
        [(b, a) for b in range(p + 1) for a in range(p + 1)]
        if ndim == 2
        else [
            (c, b, a)
            for c in range(p + 1)
            for b in range(p + 1)
            for a in range(p + 1)
        ]
    )
    comps = []
    for d in range(dim):
        acc = {}
        for slot, off in enumerate(offs):
            block = rt[d, slot].reshape(reps_rev)
            cfg = [
                (o // p, 1 - o // p, 0) for o, nc in zip(off, reps_rev)
            ]  # boundary pad to nc+1 at start o // p
            blockp = jax.lax.pad(block, zero, cfg)
            key = tuple(o % p for o in off)
            acc[key] = blockp if key not in acc else acc[key] + blockp
        keys = sorted(acc)  # lexicographic: flat phase = q0*p^.. + .. + q_last
        A = jnp.stack([acc[k] for k in keys], axis=-1)
        A = A.reshape(tuple(nc + 1 for nc in reps_rev) + (p,) * ndim)
        # interleave trailing phase axes (ph_0, .., ph_{ndim-1}) back into
        # their lattice axes, innermost lattice axis first
        for ax in range(ndim - 1, -1, -1):
            A = jnp.moveaxis(A, -1, ax + 1)
            shape = A.shape[:ax] + (A.shape[ax] * p,) + A.shape[ax + 2 :]
            A = A.reshape(shape)
            A = jax.lax.slice_in_dim(A, 0, grid_shape[ax], axis=ax)
        comps.append(A)
    return jnp.stack(comps, axis=-1)


def _overlap_add_T_dilated(rt: jnp.ndarray, p: int, reps_rev, grid_shape) -> jnp.ndarray:
    """Interior-dilated-pad formulation (exact adjoint of the stride-p
    slice extraction); used for p = 1 where phases degenerate."""
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
