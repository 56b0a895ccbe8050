"""Pallas TPU kernel for the Q1 structured element operator.

The XLA formulation (ops/structured.py) materializes the patch tensor, the
matmul result and every interior-padded partial sum in HBM — ~10x more HBM
traffic than the operator's working set. This kernel fuses
extract -> element-matrix contraction -> overlap-add into one pass through
VMEM: per grid step it reads one slab of the nodal lattice, forms all
(s, t) slot-pair contributions in registers/VMEM, and writes each output
plane exactly once.

Key structure (3D; 2D is the same with one fewer axis):

* the grid runs over z-slabs of B cell planes — TPU Pallas grids execute
  SEQUENTIALLY on a core, so the one node plane shared by consecutive
  slabs is carried in VMEM scratch and added to the next slab's bottom
  plane (no scatter, no atomics, no races);
* within a slab, the operator is applied as 64 slot-pair updates
  local[d, s-window] += E[(s,d),(t,e)] * u[e, t-window] with the E entries
  embedded as trace-time scalars — pure VPU fused multiply-adds over
  lane-contiguous windows, no gathers and no reshapes (the (edofs, edofs)
  MXU form would need a (B, ncy, ncx) -> (B*ncy*ncx,) relayout per slot,
  which Mosaic handles poorly for unaligned lane extents);
* the lattice is zero-padded in z to a whole number of slabs: padded cells
  act on zero displacements and contribute exactly nothing, so no masking
  is needed anywhere (boundary truncation is automatic in the per-cell
  slot-pair view).

Used for the f32 multigrid level operators (all Q1), where the V-cycle
dominates the Newton-Krylov per-iteration cost. Falls back to the XLA
formulation off-TPU or for degree > 1 (see make_structured_operator_auto).

Replaces the deal.II sparse SpMV consumed by the reference solvers
(`linear_elasticity.cc:536-555` CG loop; assembly `:276-345`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace
from .structured import (
    StructuredOperator,
    _grid_shape,
    make_structured_operator,
)


_I0 = np.int32(0)  # index maps must stay i32 under jax x64


def _slot_offsets(dim: int):
    """Q1 local-node offsets in tabulation order (x fastest)."""
    if dim == 2:
        return [(b, a) for b in (0, 1) for a in (0, 1)]
    return [(c, b, a) for c in (0, 1) for b in (0, 1) for a in (0, 1)]


def _make_kernel_3d(E: np.ndarray, ny: int, nx: int, ncz: int, dtype):
    """Plane-at-a-time kernel: grid step k consumes node planes (k, k+1)
    (= cell plane k) and writes node plane k. All temporaries are single
    (ncy, ncx) planes, keeping the Mosaic VMEM stack small at any lattice
    size; the upper-slot contributions to plane k+1 ride in scratch."""
    slots = _slot_offsets(3)
    ncy, ncx = ny - 1, nx - 1
    dim = 3

    def pad_yx(acc, b, a):
        """(ncy, ncx) -> (ny, nx): shift by (b, a) with zero borders, built
        from concatenates (Mosaic has no value scatter/pad)."""
        zy = jnp.zeros((1, ncx), dtype=dtype)
        acc = jnp.concatenate([zy, acc] if b else [acc, zy], axis=0)
        zx = jnp.zeros((ny, 1), dtype=dtype)
        return jnp.concatenate([zx, acc] if a else [acc, zx], axis=1)

    def kernel(uA_ref, uB_ref, out_ref, carry):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        # ghost-cell guard: the z-padding adds one cell plane beyond the
        # real lattice that still TOUCHES the real top node plane, so its
        # element contributions must be zeroed (zero-padding u alone is
        # not enough — ghost cells act on real boundary nodes)
        valid = (k < ncz).astype(dtype)
        u0 = uA_ref[...][:, 0]  # (dim, ny, nx) node plane k
        u1 = uB_ref[...][:, 0]  # node plane k+1
        uwin = [
            [
                (u1 if c else u0)[e, b : b + ncy, a : a + ncx]
                for (c, b, a) in slots
            ]
            for e in range(dim)
        ]
        outs = []
        tops = []
        for d in range(dim):
            low = None   # contributions to node plane k
            high = None  # contributions to node plane k+1 (-> carry)
            for si, (c, b, a) in enumerate(slots):
                acc = None
                for ti in range(len(slots)):
                    for e in range(dim):
                        w = float(E[si * dim + d, ti * dim + e])
                        if w == 0.0:
                            continue
                        term = w * uwin[e][ti]
                        acc = term if acc is None else acc + term
                if acc is None:
                    continue
                acc = pad_yx(acc, b, a)
                if c == 0:
                    low = acc if low is None else low + acc
                else:
                    high = acc if high is None else high + acc
            outs.append(carry[d] + valid * low)
            tops.append(valid * high)
        out_ref[...] = jnp.stack(outs, axis=0)[:, None]
        carry[...] = jnp.stack(tops, axis=0)

    return kernel


def _make_kernel_2d(E: np.ndarray, nx: int, ncy: int, dtype):
    """Row-at-a-time 2D analog of the 3D plane kernel."""
    slots = _slot_offsets(2)
    ncx = nx - 1
    dim = 2

    def pad_x(acc, a):
        zx = jnp.zeros((1, 1), dtype=dtype)
        acc = acc[None]
        out = jnp.concatenate([zx, acc] if a else [acc, zx], axis=1)
        return out[0]

    def kernel(uA_ref, uB_ref, out_ref, carry):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        valid = (k < ncy).astype(dtype)
        u0 = uA_ref[...][:, 0]  # (dim, nx) node row k
        u1 = uB_ref[...][:, 0]
        uwin = [
            [(u1 if b else u0)[e, a : a + ncx] for (b, a) in slots]
            for e in range(dim)
        ]
        outs = []
        tops = []
        for d in range(dim):
            low = None
            high = None
            for si, (b, a) in enumerate(slots):
                acc = None
                for ti in range(len(slots)):
                    for e in range(dim):
                        w = float(E[si * dim + d, ti * dim + e])
                        if w == 0.0:
                            continue
                        term = w * uwin[e][ti]
                        acc = term if acc is None else acc + term
                if acc is None:
                    continue
                acc = pad_x(acc, a)
                if b == 0:
                    low = acc if low is None else low + acc
                else:
                    high = acc if high is None else high + acc
            outs.append(carry[d] + valid * low)
            tops.append(valid * high)
        out_ref[...] = jnp.stack(outs, axis=0)[:, None]
        carry[...] = jnp.stack(tops, axis=0)

    return kernel


# deferred import so the module imports cleanly on hosts without pallas
try:  # pragma: no cover - environment probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _make_slab_kernel_3d(E, nA, nL, ncz, B, io_dtype, cdtype, nch=3):
    """Slab kernel: grid step k consumes node planes [kB, kB+B] and writes
    node planes [kB, kB+B). vs the plane-at-a-time kernel: B cell planes of
    slot-pair FMAs per step (amortizing per-step overhead), overlap-add via
    read-modify-write slice accumulation on a VMEM scratch slab (no
    concatenate/pad copies), and the in-plane axes are pre-swapped by the
    caller so the LONGER extent rides the 128-wide lane dimension.

    `nch` is the per-node channel count: 3 (displacement components) for the
    Q1 operator; 24 (3 components x 8 parity phases) when the kernel is
    reused as the phase-split Q2 operator (ops/pallas_phase.py), where E is
    the (8*nch, 8*nch) phase-remapped element matrix."""
    slots = [(c, b, a) for c in (0, 1) for b in (0, 1) for a in (0, 1)]
    ncA, ncL = nA - 1, nL - 1
    dim = nch

    def kernel(uA_ref, uB_ref, out_ref, carry):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        u_slab = uA_ref[...].astype(cdtype)  # (dim, B, nA, nL)
        u_top = uB_ref[...].astype(cdtype)  # (dim, 1, nA, nL)
        u_ext = jnp.concatenate([u_slab, u_top], axis=1)  # (dim, B+1, ..)
        # Pre-shifted ALIGNED copies: window slices at in-plane offsets
        # (b, a) in {0,1}^2 would give every FMA operand a misaligned
        # sublane/lane layout (Mosaic inserts shift ops per use — measured
        # ~10x over the VPU bound). Shifting u once per (b, a) instead
        # makes all slot windows offset-0 slices of one of 4 copies.
        zL = jnp.zeros_like(u_ext[..., :1])
        zA = jnp.zeros_like(u_ext[:, :, :1, :])
        u01 = jnp.concatenate([u_ext[..., 1:], zL], axis=-1)
        u10 = jnp.concatenate([u_ext[:, :, 1:, :], zA], axis=-2)
        u11 = jnp.concatenate([u10[..., 1:], zL], axis=-1)
        base = {(0, 0): u_ext, (0, 1): u01, (1, 0): u10, (1, 1): u11}
        # ghost-cell guard: padded z cell planes still touch the top real
        # node plane, so their contributions are masked out per cell plane
        zs = k * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
        mask = (zs < ncz).astype(cdtype)
        uwin = [
            [
                base[(b, a)][e, c : c + B, :ncA, :ncL]
                for (c, b, a) in slots
            ]
            for e in range(dim)
        ]
        zplane = jnp.zeros((1, ncA, ncL), dtype=cdtype)

        def pad_ba(v, b, a):
            """(B+1, ncA, ncL) -> (B+1, nA, nL) placed at offset (b, a)."""
            zrow = jnp.zeros((B + 1, 1, ncL), dtype=cdtype)
            v = jnp.concatenate([zrow, v] if b else [v, zrow], axis=1)
            zcol = jnp.zeros((B + 1, nA, 1), dtype=cdtype)
            return jnp.concatenate([zcol, v] if a else [v, zcol], axis=2)

        outs = []
        tops = []
        for d in range(dim):
            # per (z-offset, b, a) slot sums — all operands aligned
            sums = {}
            for si, (c, b, a) in enumerate(slots):
                acc = None
                for ti in range(len(slots)):
                    for e in range(dim):
                        w = float(E[si * dim + d, ti * dim + e])
                        if w == 0.0:
                            continue
                        term = w * uwin[e][ti]
                        acc = term if acc is None else acc + term
                if acc is not None:
                    sums[(c, b, a)] = acc * mask
            # combine into a full (B+1, nA, nL) column for this component:
            # only 4 shifted adds per component touch misaligned layouts
            outd = None
            for b in (0, 1):
                for a in (0, 1):
                    low = sums.get((0, b, a))
                    high = sums.get((1, b, a))
                    if low is None and high is None:
                        continue
                    col = jnp.concatenate(
                        [zplane if low is None else low, zplane], axis=0
                    )
                    if high is not None:
                        col = col + jnp.concatenate([zplane, high], axis=0)
                    p = pad_ba(col, b, a)
                    outd = p if outd is None else outd + p
            first = (outd[0] + carry[d])[None]
            # B == 1: the block is exactly the carried first plane — a
            # zero-size outd[1:1] slice fails Mosaic vector typing
            outs.append(
                first if B == 1
                else jnp.concatenate([first, outd[1:B]], axis=0)
            )
            tops.append(outd[B])
        out_ref[...] = jnp.stack(outs, axis=0).astype(out_ref.dtype)
        carry[...] = jnp.stack(tops, axis=0)

    return kernel


@dataclasses.dataclass(frozen=True)
class PallasQ1SlabOperator:
    """Slab-fused Q1 structured operator (3D): same call surface as
    StructuredOperator. I/O in `dtype_name` (f32 or bf16 on TPU; the V-cycle
    hierarchy runs bf16), accumulation in f32 (f64 under interpret tests)."""

    E_host: tuple
    grid_shape: Tuple[int, ...]  # (nz, ny, nx) canonical, slowest first
    dtype_name: str
    slab: int = 4
    interpret: bool = False

    def _E(self) -> np.ndarray:
        return np.asarray(self.E_host, dtype=np.float64)

    @functools.cached_property
    def _apply(self):
        dim = 3
        dtype = jnp.dtype(self.dtype_name)
        cdtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
        nz, ny, nx = self.grid_shape
        # put the longer in-plane extent on the lane (last) axis
        swap = ny > nx
        nA, nL = (nx, ny) if swap else (ny, nx)
        E = self._E()
        if swap:
            # slot order follows (z, A, L) = (z, x, y): re-permute the
            # element matrix from the canonical (z, y, x) local order
            perm = []
            for c in (0, 1):
                for b in (0, 1):  # A = x
                    for a in (0, 1):  # L = y
                        # canonical slot index of (z=c, y=a, x=b)
                        perm.append(c * 4 + a * 2 + b)
            idx = np.repeat(np.asarray(perm) * dim, dim) + np.tile(
                np.arange(dim), len(perm)
            )
            E = E[np.ix_(idx, idx)]
        ncz = nz - 1
        B = max(1, min(self.slab, ncz))
        # enough steps that node plane nz-1 is always inside a written
        # block: when B divides ncz the top plane's contributions ride the
        # carry into one extra (all-ghost-cell) step
        n_steps = -(-nz // B)  # cdiv over NODE planes
        nz_pad = n_steps * B + 1
        kernel = _make_slab_kernel_3d(E, nA, nL, ncz, B, dtype, cdtype)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((dim, n_steps * B, nA, nL), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (dim, B, nA, nL),
                    lambda k: (_I0, k, _I0, _I0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (dim, 1, nA, nL),
                    lambda k: (_I0, (k + np.int32(1)) * np.int32(B), _I0, _I0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (dim, B, nA, nL),
                lambda k: (_I0, k, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((dim, nA, nL), cdtype)],
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

        def apply(u):
            u_grid = u.reshape((nz, ny, nx, dim))
            ut = jnp.moveaxis(u_grid, -1, 0).astype(dtype)  # (dim, z, y, x)
            if swap:
                ut = ut.transpose(0, 1, 3, 2)  # (dim, z, x, y)
            ut = jnp.pad(ut, ((0, 0), (0, nz_pad - nz), (0, 0), (0, 0)))
            out = call(ut, ut)[:, :nz]
            if swap:
                out = out.transpose(0, 1, 3, 2)
            r = jnp.moveaxis(out, 0, -1)
            return r.reshape(-1, dim)

        return apply

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._apply(u).astype(u.dtype)

    def diagonal(self) -> jnp.ndarray:
        E = self._E()
        dim = 3
        npc = E.shape[0] // dim
        d = np.diag(E).reshape(npc, dim)
        reps_rev = tuple(s - 1 for s in self.grid_shape)
        out = np.zeros(tuple(self.grid_shape) + (dim,))
        for si, off in enumerate(_slot_offsets(dim)):
            sl = tuple(slice(o, o + r) for o, r in zip(off, reps_rev))
            out[sl] += d[si]
        return jnp.asarray(
            out.reshape(-1, dim), dtype=jnp.dtype(self.dtype_name)
        )


def make_pallas_q1_slab_operator(
    space: DofSpace,
    E: np.ndarray,
    dtype=jnp.float32,
    slab: int = 4,
    interpret: bool = False,
) -> PallasQ1SlabOperator:
    E = np.asarray(E, dtype=np.float64)
    return PallasQ1SlabOperator(
        E_host=tuple(tuple(row) for row in E),
        grid_shape=_grid_shape(space),
        dtype_name=str(jnp.dtype(dtype)),
        slab=slab,
        interpret=interpret,
    )


@dataclasses.dataclass(frozen=True)
class PallasQ1Operator:
    """Same call surface as StructuredOperator, fused in one Pallas pass."""

    E_host: tuple  # hashable host copy of the element matrix (row tuples)
    dim: int
    grid_shape: Tuple[int, ...]  # node lattice, slowest first
    dtype_name: str
    interpret: bool = False

    def _E(self) -> np.ndarray:
        return np.asarray(self.E_host, dtype=np.float64)

    @functools.cached_property
    def _apply(self):
        dim = self.dim
        dtype = jnp.dtype(self.dtype_name)
        E = self._E()
        if dim == 3:
            nz, ny, nx = self.grid_shape
            ncz = nz - 1
            n_steps = nz  # cell planes 0..ncz-1 plus the final node plane
            kernel = _make_kernel_3d(E, ny, nx, ncz, dtype)
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((dim, nz, ny, nx), dtype),
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec(
                        (dim, 1, ny, nx),
                        lambda k: (_I0, k, _I0, _I0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (dim, 1, ny, nx),
                        lambda k: (_I0, k + np.int32(1), _I0, _I0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (dim, 1, ny, nx),
                    lambda k: (_I0, k, _I0, _I0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((dim, ny, nx), dtype)],
                compiler_params=None
                if self.interpret
                else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )

            def apply(u):
                u_grid = u.reshape(self.grid_shape + (dim,))
                ut = jnp.moveaxis(u_grid, -1, 0).astype(dtype)
                ut = jnp.pad(ut, ((0, 0), (0, 1), (0, 0), (0, 0)))
                out = call(ut, ut)
                r = jnp.moveaxis(out, 0, -1)
                return r.reshape(-1, dim)

            return apply

        ny, nx = self.grid_shape
        ncy = ny - 1
        kernel = _make_kernel_2d(E, nx, ncy, dtype)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((dim, ny, nx), dtype),
            grid=(ny,),
            in_specs=[
                pl.BlockSpec(
                    (dim, 1, nx), lambda k: (_I0, k, _I0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (dim, 1, nx), lambda k: (_I0, k + np.int32(1), _I0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (dim, 1, nx), lambda k: (_I0, k, _I0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((dim, nx), dtype)],
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

        def apply(u):
            u_grid = u.reshape(self.grid_shape + (dim,))
            ut = jnp.moveaxis(u_grid, -1, 0).astype(dtype)
            ut = jnp.pad(ut, ((0, 0), (0, 1), (0, 0)))
            out = call(ut, ut)
            r = jnp.moveaxis(out, 0, -1)
            return r.reshape(-1, dim)

        return apply

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._apply(u).astype(u.dtype)

    def diagonal(self) -> jnp.ndarray:
        """Assembled diagonal (host-computed once, device constant)."""
        E = self._E()
        dim = self.dim
        npc = E.shape[0] // dim
        d = np.diag(E).reshape(npc, dim)
        reps_rev = tuple(s - 1 for s in self.grid_shape)
        n_cells = int(np.prod(reps_rev))
        # overlap-add of the constant per-cell diagonal on the host
        out = np.zeros(tuple(self.grid_shape) + (dim,))
        slots = _slot_offsets(dim)
        for si, off in enumerate(slots):
            sl = tuple(
                slice(o, o + r) for o, r in zip(off, reps_rev)
            )
            out[sl] += d[si]
        del n_cells
        return jnp.asarray(out.reshape(-1, dim), dtype=jnp.dtype(self.dtype_name))


def pallas_q1_supported(space: DofSpace, dtype) -> bool:
    """Gate: TPU backend, Q1, 2D/3D, f32/bf16 (f64 stays on the XLA path —
    Mosaic has no f64 vector ALU on current TPUs; bf16 I/O computes f32
    in-kernel)."""
    if not _PALLAS_OK:
        return False
    if space.mesh.degree != 1 or space.dim not in (2, 3):
        return False
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def make_pallas_q1_operator(
    space: DofSpace, E: np.ndarray, dtype=jnp.float32, interpret: bool = False
) -> PallasQ1Operator:
    E = np.asarray(E, dtype=np.float64)
    return PallasQ1Operator(
        E_host=tuple(tuple(row) for row in E),
        dim=space.dim,
        grid_shape=_grid_shape(space),
        dtype_name=str(jnp.dtype(dtype)),
        interpret=interpret,
    )


def make_structured_operator_auto(
    space: DofSpace,
    E: np.ndarray,
    dtype=jnp.float64,
    precision: str = "highest",
    use_pallas: bool = True,
):
    """Pallas-fused operator when supported, XLA formulation otherwise.
    The Pallas path is exact (same per-cell arithmetic, f32), so callers
    need no behavioral switch — this is purely a bandwidth optimization."""
    if use_pallas and pallas_q1_supported(space, dtype):
        import sys as _sys

        from ..utils import tunecache

        # sidecar-cached probe outcome: whether this kernel lowers at this
        # shape/dtype is a property of (kernel source, hardware, shape) —
        # a fresh process must not re-pay one standalone probe compile per
        # MG level (round-4 forensics: the model-build phase dominated the
        # driver-window bench budget). The kernels' source fingerprint
        # keys the record, so editing this file re-probes.
        fp = tunecache.source_fingerprint(_sys.modules[__name__])
        skey = tunecache.hardware_key(
            "q1_slab_probe",
            "x".join(map(str, _grid_shape(space))),
            str(jnp.dtype(dtype)),
            fp,
        )
        rec = tunecache.load_probe("pallas_probe", skey)
        try:
            if not tunecache.pallas_healthy():
                # Mosaic compiles are down for this process (broken remote
                # compile helper): a cached ok=True record must not put an
                # uncompilable kernel inside the enclosing model jit
                raise RuntimeError("pallas unhealthy this process")
            if space.dim == 3:
                op = make_pallas_q1_slab_operator(space, E, dtype, slab=4)
            else:
                op = make_pallas_q1_operator(space, E, dtype)
            if rec is None or not rec.get("ok"):
                if rec is not None and not rec.get("ok"):
                    raise RuntimeError("cached probe failure")
                # build-time smoke test: force one compile on the real
                # shape so an unsupported Mosaic lowering falls back here
                # instead of failing inside the enclosing model jit
                # (transient tunnel failures are retried in-process)
                probe = jnp.zeros((space.n_nodes, space.dim), dtype=dtype)
                tunecache.probe_with_retry(
                    lambda: jax.block_until_ready(op(probe))
                )
                tunecache.store("pallas_probe", skey, dict(ok=True))
            return op
        except Exception as e:  # noqa: BLE001 - any lowering failure -> XLA
            if rec is None and not tunecache.transient_failure(str(e)):
                tunecache.store(
                    "pallas_probe", skey, dict(ok=False, error=str(e)[:200])
                )
            print(
                "pallas_structured: Q1 slab kernel unavailable "
                f"({type(e).__name__}); using the XLA formulation",
                file=_sys.stderr,
            )
    return make_structured_operator(space, E, dtype, precision)


__all__ = [
    "PallasQ1Operator",
    "PallasQ1SlabOperator",
    "make_pallas_q1_slab_operator",
    "make_pallas_q1_operator",
    "make_structured_operator_auto",
    "pallas_q1_supported",
    "StructuredOperator",
]
