"""Assembled 27-point stencil form of the Q1 structured operator.

On a uniform tensor-product lattice the ASSEMBLED Q1 operator is
translation-invariant in the interior: out[n] = sum_{delta in {-1,0,1}^d}
S[delta] @ u[n + delta], with S[delta] = sum over element-matrix slot
pairs (i, j) with off_j - off_i = delta. That replaces the per-cell
slot-pair formulation (576 FMA/cell + extract/overlap data movement,
`ops/structured.py` / `ops/pallas_structured.py`) with 27 shifted
elementwise FMAs over the nodal lattice (243 FMA/node in 3D) that XLA
fuses into one pass — the MXU/lane-friendly layout for the multigrid Q1
level operators (the dominant V-cycle cost at bench scale).

Boundary exactness comes from inclusion-exclusion over ghost cells: the
interior stencil applied to the zero-padded lattice overcounts exactly
the couplings of ghost cells (cells of the one-cell-extended lattice)
between their REAL nodes, and the ghost-cell layers factor by axis:

    out = S3conv(u)  - sum_faces   S2conv(face plane of u)
                     + sum_edges   S1conv(edge line of u)
                     - sum_corners C @ u[corner]

where the face/edge/corner stencils are the element matrix restricted to
slot pairs lying on the shared face/edge/corner (e.g. the z-low face
uses pairs with z-offset 1 on both slots: the ghost cell below the
domain touches only the bottom node plane). All corrections are
O(surface) work on planes/lines/points.

Replaces the deal.II sparse SpMV consumed by the reference CG solvers
(`linear_elasticity.cc:536-555`; assembly `:276-345`) for the Q1 levels.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace
from .structured import _grid_shape


def _slots(ndim: int):
    """Q1 local-node offsets in tabulation order (x fastest), as tuples in
    GRID axis order (slowest first): 3D -> (z, y, x)."""
    if ndim == 2:
        return [(b, a) for b in (0, 1) for a in (0, 1)]
    return [(c, b, a) for c in (0, 1) for b in (0, 1) for a in (0, 1)]


def q1_stencil_tables(E: np.ndarray, ndim: int, dim: int):
    """Build the interior + boundary-correction stencil tables from the
    node-major (npc*dim, npc*dim) Q1 element matrix.

    Returns (S3, faces, edges, corners):
      S3: (3,)*ndim + (dim, dim) interior stencil, index [delta+1]
      faces: {(axis, side): (3,)*(ndim-1) + (dim, dim)} per boundary face
      edges: {(axes, sides): (3,)*(ndim-2) + (dim, dim)} (3D only; in 2D
             these are the corner table)
      corners: {corner_sides: (dim, dim)}
    side/sides entries are 0 (low boundary) or 1 (high boundary). A ghost
    cell BELOW the domain shares its TOP nodes (slot offset 1) with the
    real lattice, so side 0 restricts slots to offset 1 and vice versa.
    """
    offs = _slots(ndim)
    npc = len(offs)
    E4 = np.asarray(E, dtype=np.float64).reshape(npc, dim, npc, dim)

    S3 = np.zeros((3,) * ndim + (dim, dim))
    for i, oi in enumerate(offs):
        for j, oj in enumerate(offs):
            d = tuple(oj[k] - oi[k] + 1 for k in range(ndim))
            S3[d] += E4[i, :, j, :]

    def restricted(fixed):
        """Stencil over the free axes from slot pairs pinned on `fixed`
        axes: {axis: side} with side 0 => slot offset 1 (ghost below)."""
        free = [k for k in range(ndim) if k not in fixed]
        T = np.zeros((3,) * len(free) + (dim, dim))
        for i, oi in enumerate(offs):
            if any(oi[k] != (1 - s) for k, s in fixed.items()):
                continue
            for j, oj in enumerate(offs):
                if any(oj[k] != (1 - s) for k, s in fixed.items()):
                    continue
                d = tuple(oj[k] - oi[k] + 1 for k in free)
                T[d] += E4[i, :, j, :]
        return T

    faces = {}
    for ax in range(ndim):
        for side in (0, 1):
            faces[(ax, side)] = restricted({ax: side})

    edges = {}
    corners = {}
    if ndim == 3:
        for ax1 in range(ndim):
            for ax2 in range(ax1 + 1, ndim):
                for s1 in (0, 1):
                    for s2 in (0, 1):
                        edges[((ax1, ax2), (s1, s2))] = restricted(
                            {ax1: s1, ax2: s2}
                        )
        for s0 in (0, 1):
            for s1 in (0, 1):
                for s2 in (0, 1):
                    corners[(s0, s1, s2)] = restricted(
                        {0: s0, 1: s1, 2: s2}
                    )
    else:
        for s0 in (0, 1):
            for s1 in (0, 1):
                corners[(s0, s1)] = restricted({0: s0, 1: s1})
    return S3, faces, edges, corners


def _conv_nd(g: jnp.ndarray, S: np.ndarray, compute_dtype) -> jnp.ndarray:
    """Zero-padded stencil convolution: g is (*lattice, dim), S is
    (3,)*nd + (dim, dim); out[..., d] = sum_delta,e S[delta, d, e] *
    g[.. + delta, e]. Expressed as shifted scalar FMAs so XLA fuses the
    whole thing into one elementwise pass."""
    nd = g.ndim - 1
    dim = g.shape[-1]
    shape = g.shape[:-1]
    gp = jnp.pad(g.astype(compute_dtype), [(1, 1)] * nd + [(0, 0)])
    comps = [None] * dim
    for delta in np.ndindex(*(3,) * nd):
        W = S[delta]
        if not np.any(W):
            continue
        win = gp[
            tuple(slice(d, d + n) for d, n in zip(delta, shape))
        ]
        for d in range(dim):
            acc = None
            for e in range(dim):
                w = float(W[d, e])
                if w == 0.0:
                    continue
                t = w * win[..., e]
                acc = t if acc is None else acc + t
            if acc is not None:
                comps[d] = acc if comps[d] is None else comps[d] + acc
    zero = jnp.zeros(shape, dtype=compute_dtype)
    return jnp.stack([c if c is not None else zero for c in comps], axis=-1)


def _vmem_bytes_estimate(shape, dim, io_itemsize, cdt_itemsize):
    """Conservative VMEM footprint of the 'vmem' kernel: padded input +
    output (tiled to (sublane, 128) lanes) + the 3 f32 accumulator slabs."""
    Z, Y, X = shape
    swap = Y > X
    A, L = (X, Y) if swap else (Y, X)

    def tiled(a, sub):
        return -(-a // sub) * sub

    sub_in = 16 if io_itemsize == 2 else 8
    in_b = dim * (Z + 2) * tiled(A + 2, sub_in) * tiled(L + 2, 128) * io_itemsize
    out_b = dim * Z * tiled(A, sub_in) * tiled(L, 128) * io_itemsize
    acc_b = dim * tiled(A, 8) * tiled(L, 128) * cdt_itemsize
    return in_b + out_b + acc_b


# VMEM budget for the whole-field kernel; v5e exposes ~16 MB minus
# compiler reserves. Every MG level of the bench configs fits well under
# this in bf16; an out-of-budget build raises so autotune skips it.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_pass(S3, shape, dim, cdt, io_dtype):
    """Whole-field-in-VMEM Pallas interior pass (see class docstring).

    Layout (dim, Z, A, L) with the LONG in-plane axis L in lanes. The
    padded field is read from HBM once; the z-plane loop then runs
    entirely out of VMEM: for each of the <=81 (source component, dz,
    da, dl) offsets one (A, L) window load is shared by the three output
    components' scalar-weight FMAs (<=243 of them, 243 FMA/node total —
    the same contraction as every other strategy).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = shape
    if dim != 3:
        raise ValueError("vmem stencil strategy supports dim=3 only")
    interpret = jax.default_backend() != "tpu"
    if not interpret and io_dtype not in (jnp.bfloat16, jnp.float32):
        raise ValueError(
            f"vmem stencil strategy compiles for bf16/f32 I/O only, got "
            f"{io_dtype} (f64 is supported in interpret mode off-TPU)"
        )
    est = _vmem_bytes_estimate(
        shape, dim, jnp.dtype(io_dtype).itemsize, jnp.dtype(cdt).itemsize
    )
    if not interpret and est > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"vmem stencil strategy needs ~{est/2**20:.1f} MB VMEM for "
            f"grid {shape} at {io_dtype}, over the {_VMEM_BUDGET_BYTES/2**20:.0f}"
            " MB budget"
        )

    # in-plane axes: A in sublanes, L (the longer one) in lanes
    swap = Y > X
    A, L = (X, Y) if swap else (Y, X)
    # S3 is indexed [dz, dy, dx, d, e] (grid axes slowest-first); permute
    # the in-plane offset axes to (dz, dA, dL)
    S3p = S3.transpose(0, 2, 1, 3, 4) if swap else S3

    def kernel(u_ref, out_ref):
        def zbody(z, carry):
            accs = [jnp.zeros((A, L), dtype=cdt) for _ in range(dim)]
            for e in range(dim):
                # one dynamic 3-plane load per source component; all window
                # slices below are STATIC. Arithmetic on the induction
                # variable (z + dz) is deliberately avoided: under
                # jax_enable_x64 (package default) the int literal lowers
                # as i64 and Mosaic rejects the mixed i64/i32 addi
                # (verification error observed on v5e; interpret mode and
                # the CPU tests mask it).
                planes = u_ref[e, pl.ds(z, 3)].astype(cdt)  # (3, A+2, L+2)
                for dz in range(3):
                    for da in range(3):
                        for dl in range(3):
                            col = S3p[dz, da, dl, :, e]
                            if not np.any(col):
                                continue
                            win = planes[dz, da:da + A, dl:dl + L]
                            for d in range(dim):
                                w = float(col[d])
                                if w != 0.0:
                                    accs[d] = accs[d] + w * win
            for d in range(dim):
                out_ref[d, z] = accs[d].astype(out_ref.dtype)
            return carry

        # i32 loop bounds: plain-int bounds would make the induction
        # variable i64 under x64
        jax.lax.fori_loop(np.int32(0), np.int32(Z), zbody, np.int32(0))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dim, Z, A, L), io_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def vmem_apply(g):
        # g: (Z, Y, X, dim) -> (dim, Z, A, L), zero-padded by 1 per axis
        gt = jnp.moveaxis(g, -1, 0).astype(io_dtype)
        if swap:
            gt = gt.transpose(0, 1, 3, 2)
        gp = jnp.pad(gt, ((0, 0), (1, 1), (1, 1), (1, 1)))
        out = call(gp)
        if swap:
            out = out.transpose(0, 1, 3, 2)
        return jnp.moveaxis(out, 0, -1).astype(cdt)

    return vmem_apply


@dataclasses.dataclass(frozen=True)
class StencilQ1Operator:
    """Same call surface as StructuredOperator (p=1 only): `__call__` on a
    (n_nodes, dim) field, plus `diagonal()`. Exact — bit-equivalent
    arithmetic is not promised (different summation order) but the result
    matches the per-cell formulation to roundoff (tested).

    `strategy` picks the INTERIOR pass formulation (the O(surface)
    boundary corrections always use the shift form):
      "shift":  27 shifted elementwise FMAs fused by XLA (VPU-bound)
      "conv":   one `lax.conv_general_dilated` NCDHW 3x3x3 convolution
                with dim-channel feature dims (XLA's TPU conv emitter)
      "banded": 9 MXU matmuls — for each (dz, dy) plane offset, the
                dx/component coupling is a banded (X*dim, X*dim) matrix
                applied to (Z*Y, X*dim) shifted planes; trades ~X/3 extra
                FLOPs for MXU throughput and lane-aligned layouts
      "flat":   lane-flattened VPU pass — x and components merge into one
                trailing axis (Z, Y, X*dim) that fills the 128-lane
                registers (the (..., dim) layout of "shift" pads dim=3 to
                128 lanes); each (dz, dy, lane-shift) term is one FMA with
                a lane-periodic coefficient vector (<= 9*(4*dim-1) terms
                vs 27*dim^2 plane ops for "shift")
      "flatx":  like "flat" but transposed to (Z, X*dim, Y): the LONG
                lattice axis fills the lanes (better 128-lane utilization
                on flap-like meshes where X is short), lane shifts are
                only the +-1 of the y-offsets, and the x/component shifts
                move along sublanes with per-sublane coefficient columns
      "vmem":   Pallas kernel with the ENTIRE padded field resident in
                VMEM (it is only a few MB at any MG level): one fori_loop
                over z-planes, 81 shared window loads per plane (one per
                (source component, dz, da, dl) offset, reused by all 3
                output components) and scalar-weight slab FMAs — the
                whole interior pass touches HBM exactly once for the
                input and once for the output, where the XLA strategies
                re-read the field from HBM per shifted term. Long
                in-plane axis in lanes (as "flatx"/the slab kernel).
                3D only; compiled path needs bf16/f32 I/O (interpret
                mode — off-TPU tests — also takes f64).
    """

    tables: tuple  # hashable host copy: nested tuples of the 4 table sets
    ndim: int
    dim: int
    grid_shape: Tuple[int, ...]
    dtype_name: str
    strategy: str = "shift"

    # -- construction ---------------------------------------------------

    @staticmethod
    def build(
        space: DofSpace, E: np.ndarray, dtype=jnp.float64,
        strategy: str = "shift",
    ):
        if space.mesh.degree != 1:
            raise ValueError("StencilQ1Operator requires degree-1 meshes")
        if strategy not in ("shift", "conv", "banded", "flat", "flatx", "vmem"):
            raise ValueError(f"unknown stencil strategy {strategy!r}")
        ndim = space.dim
        if ndim != 3 and strategy != "shift":
            strategy = "shift"  # conv/banded formulations are 3D-only
        S3, faces, edges, corners = q1_stencil_tables(E, ndim, space.dim)

        def h(a):
            return tuple(map(tuple, np.asarray(a).reshape(-1, a.shape[-1])))

        # store raw bytes via .tobytes() is unhashable-unfriendly; keep
        # nested tuples keyed in deterministic order
        faces_t = tuple(
            (k, h(v)) for k, v in sorted(faces.items())
        )
        edges_t = tuple((k, h(v)) for k, v in sorted(edges.items()))
        corners_t = tuple((k, h(v)) for k, v in sorted(corners.items()))
        return StencilQ1Operator(
            tables=(h(S3), faces_t, edges_t, corners_t),
            ndim=ndim,
            dim=space.dim,
            grid_shape=_grid_shape(space),
            dtype_name=str(jnp.dtype(dtype)),
            strategy=strategy,
        )

    def _unpack(self):
        dim = self.dim
        nd = self.ndim
        S3_t, faces_t, edges_t, corners_t = self.tables

        def back(t, nfree):
            a = np.asarray(t, dtype=np.float64)
            return a.reshape((3,) * nfree + (dim, dim))

        S3 = back(S3_t, nd)
        faces = {k: back(v, nd - 1) for k, v in faces_t}
        edges = {k: back(v, nd - 2) for k, v in edges_t}
        corners = {k: back(v, 0) for k, v in corners_t}
        return S3, faces, edges, corners

    # -- application ----------------------------------------------------

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._apply_fn(u).astype(u.dtype)

    @property
    def _apply_fn(self):
        # cached per-instance jittable closure
        fn = getattr(self, "_cached_apply", None)
        if fn is not None:
            return fn
        S3, faces, edges, corners = self._unpack()
        nd, dim = self.ndim, self.dim
        shape = self.grid_shape
        dtype = jnp.dtype(self.dtype_name)
        # bf16 I/O computes in f32 (VPU upcast is free; halves HBM traffic)
        cdt = jnp.float32 if dtype in (jnp.bfloat16, jnp.float32) else dtype

        def sel(side, n):
            return 0 if side == 0 else n - 1

        interior = self._interior_pass(S3, shape, dim, cdt)

        def apply(u):
            g = u.reshape(shape + (dim,))
            out = interior(g)
            # face corrections (subtract ghost-layer couplings)
            for (ax, side), S2 in faces.items():
                idx = [slice(None)] * nd
                idx[ax] = sel(side, shape[ax])
                plane = g[tuple(idx)]
                corr = _conv_nd(plane, S2, cdt)
                out = out.at[tuple(idx)].add(-corr)
            if nd == 3:
                for ((ax1, ax2), (s1, s2)), S1 in edges.items():
                    idx = [slice(None)] * nd
                    idx[ax1] = sel(s1, shape[ax1])
                    idx[ax2] = sel(s2, shape[ax2])
                    line = g[tuple(idx)]
                    corr = _conv_nd(line, S1, cdt)
                    out = out.at[tuple(idx)].add(corr)
                sign = -1.0
            else:
                sign = 1.0
            for sides, C in corners.items():
                idx = tuple(sel(s, n) for s, n in zip(sides, shape))
                v = g[idx].astype(cdt)
                corr = jnp.asarray(C, dtype=cdt) @ v
                out = out.at[idx].add(sign * corr)
            return out.reshape(-1, dim).astype(dtype)

        object.__setattr__(self, "_cached_apply", apply)
        return apply

    def _interior_pass(self, S3, shape, dim, cdt):
        """The zero-padded interior stencil pass in the chosen strategy
        (see class docstring); all strategies compute the identical
        contraction, differing only in how it maps to the hardware."""
        if self.strategy == "shift" or self.ndim != 3:
            return lambda g: _conv_nd(g, S3, cdt)
        Z, Y, X = shape

        if self.strategy == "vmem":
            return _vmem_pass(
                S3, shape, dim, cdt, jnp.dtype(self.dtype_name)
            )

        if self.strategy == "conv":
            import jax.lax as lax

            # NDHWC/DHWIO: channels = displacement components, no
            # transposes of the lattice field needed
            kern = S3.transpose(0, 1, 2, 4, 3)  # [dz,dy,dx,in,out]

            def conv_pass(g):
                k = jnp.asarray(kern, dtype=cdt)
                out = lax.conv_general_dilated(
                    g.astype(cdt)[None], k, window_strides=(1, 1, 1),
                    padding="SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                return out[0]

            return conv_pass

        if self.strategy in ("flat", "flatx"):
            # Merge x and components into the lane axis. Out-lane
            # l = x*dim + d receives, for source offset (dx, e), the
            # source lane l + s with lane shift s = dim*dx + (e - d);
            # the coefficient S3[dz, dy, dx, d, e] depends on the lane
            # only through d = l % dim, so each (dz, dy, s) term is one
            # FMA of the shifted plane with a period-dim coefficient
            # vector. Zero lane-padding supplies the x-boundary zeros
            # (real-boundary terms come from the inclusion-exclusion
            # corrections, as for every strategy).
            L = X * dim
            pad = 2 * dim - 1  # max |s|
            coeffs = {}
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        for d in range(dim):
                            for e in range(dim):
                                w = S3[dz, dy, dx, d, e]
                                if w == 0.0:
                                    continue
                                s = dim * (dx - 1) + (e - d)
                                c = coeffs.setdefault(
                                    (dz, dy, s), np.zeros(L)
                                )
                                c[d::dim] += w
            # a lane at x=0 with s<0 (or x=X-1 with s>0) must only read
            # the zero pad, not a neighbouring component's lane: zero the
            # coefficient where the SOURCE lane belongs to an x outside
            # [0, X). Source x = (l + s) // dim in unpadded lanes.
            for (dz, dy, s), c in coeffs.items():
                ls = np.arange(L) + s
                c[(ls < 0) | (ls >= L)] = 0.0

            if self.strategy == "flat":

                def flat_pass(g):
                    gf = g.reshape(Z, Y, L).astype(cdt)
                    gp = jnp.pad(gf, ((1, 1), (1, 1), (pad, pad)))
                    out = None
                    for (dz, dy, s), c in sorted(coeffs.items()):
                        if not np.any(c):
                            continue
                        win = gp[dz:dz + Z, dy:dy + Y, pad + s:pad + s + L]
                        term = jnp.asarray(c, dtype=cdt) * win
                        out = term if out is None else out + term
                    return out.reshape(Z, Y, X, dim)

                return flat_pass

            # "flatx": transpose so the LONG axis (Y on flap lattices)
            # fills the lanes; the x/component shift s moves along the
            # sublane axis with a per-sublane coefficient column, and the
            # y-offsets are the only lane shifts (+-1)
            def flatx_pass(g):
                gt = g.transpose(0, 2, 3, 1).reshape(Z, L, Y).astype(cdt)
                gp = jnp.pad(gt, ((1, 1), (pad, pad), (1, 1)))
                out = None
                for (dz, dy, s), c in sorted(coeffs.items()):
                    if not np.any(c):
                        continue
                    win = gp[dz:dz + Z, pad + s:pad + s + L, dy:dy + Y]
                    term = jnp.asarray(c, dtype=cdt)[None, :, None] * win
                    out = term if out is None else out + term
                return out.reshape(Z, X, dim, Y).transpose(0, 3, 1, 2)

            return flatx_pass

        # "banded": one (X*dim, X*dim) banded matrix per (dz, dy) plane
        # offset — the x-contraction + component coupling becomes an MXU
        # matmul over (Z*Y, X*dim) shifted planes. Zero x-padding is baked
        # into the band structure (no entries for out-of-range columns).
        bands = {}
        for dz in range(3):
            for dy in range(3):
                A = np.zeros((X * dim, X * dim))
                for x in range(X):
                    for dx in range(3):
                        xx = x + dx - 1
                        if 0 <= xx < X:
                            A[
                                x * dim:(x + 1) * dim,
                                xx * dim:(xx + 1) * dim,
                            ] += S3[dz, dy, dx]
                if np.any(A):
                    bands[(dz, dy)] = A.T.copy()  # right-multiply form

        def banded_pass(g):
            import jax.lax as lax

            gf = g.reshape(Z, Y, X * dim)
            gp = jnp.pad(gf, ((1, 1), (1, 1), (0, 0)))
            out = None
            for (dz, dy), At in bands.items():
                win = gp[dz:dz + Z, dy:dy + Y]
                term = lax.dot_general(
                    win.astype(cdt), jnp.asarray(At, dtype=cdt),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=cdt,
                )
                out = term if out is None else out + term
            return out.reshape(Z, Y, X, dim)

        return banded_pass

    def diagonal(self) -> jnp.ndarray:
        """Assembled diagonal by the same inclusion-exclusion, on host."""
        S3, faces, edges, corners = self._unpack()
        nd, dim = self.ndim, self.dim
        shape = self.grid_shape
        ctr = (1,) * nd
        out = np.broadcast_to(
            np.diag(S3[ctr]), shape + (dim,)
        ).copy()

        def sel(side, n):
            return 0 if side == 0 else n - 1

        for (ax, side), S2 in faces.items():
            idx = [slice(None)] * nd
            idx[ax] = sel(side, shape[ax])
            out[tuple(idx)] -= np.diag(S2[(1,) * (nd - 1)])
        if nd == 3:
            for ((ax1, ax2), (s1, s2)), S1 in edges.items():
                idx = [slice(None)] * nd
                idx[ax1] = sel(s1, shape[ax1])
                idx[ax2] = sel(s2, shape[ax2])
                out[tuple(idx)] += np.diag(S1[(1,)])
            sign = -1.0
        else:
            sign = 1.0
        for sides, C in corners.items():
            idx = tuple(sel(s, n) for s, n in zip(sides, shape))
            out[idx] += sign * np.diag(C)
        return jnp.asarray(
            out.reshape(-1, dim), dtype=jnp.dtype(self.dtype_name)
        )


def make_q1_stencil_operator(
    space: DofSpace, E: np.ndarray, dtype=jnp.float64,
    strategy: str = "shift",
) -> StencilQ1Operator:
    return StencilQ1Operator.build(space, E, dtype, strategy=strategy)


__all__ = [
    "StencilQ1Operator",
    "make_q1_stencil_operator",
    "q1_stencil_tables",
]
