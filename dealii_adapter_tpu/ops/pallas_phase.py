"""Phase-split Pallas TPU kernel for the Q2 structured element operator.

The MG fine level smooths on a *constant* small-strain Q2 proxy operator
(models/nonlinear_elasticity.py MG branch); with the Q1 level operators at
~0.07 ms/apply, the ~4 Q2 proxy applies per V-cycle are the dominant
per-CG-iteration cost at bench scale (~3.5 ms each through the XLA
extract -> (81,81) matmul -> overlap-add path, ~10x the operator's HBM
working set).

This module removes the stride-2 access pattern that blocks the Q1 slab
kernel (ops/pallas_structured.py) from generalizing to degree 2:

* split the Q2 node lattice into its 8 parity phases
  v[pz,py,px][i,j,k] = u[2i+pz, 2j+py, 2k+px]  (zero-padded to a common
  (ncz+1, ncy+1, ncx+1) cell-lattice shape);
* a Q2 local node offset o in {0,1,2} per axis decomposes uniquely into
  (cell offset o//2 in {0,1}, phase o%2) — so on the 24-channel
  (3 components x 8 phases) phase lattice the Q2 operator is EXACTLY a
  Q1-structure slot-pair operator with offsets in {0,1}^3 and a
  (8*24, 8*24) remapped element matrix;
* the existing slab kernel (`_make_slab_kernel_3d`, nch=24) then applies
  it in one fused VMEM pass: aligned offset-{0,1} windows, sequential
  z-slab grid with a carried boundary plane, ghost-cell masking.

All 81x81x9 element couplings are applied exactly (f32 accumulation; bf16
or f32 I/O to match the V-cycle hierarchy dtype); the phase
split/interleave itself is two XLA reshapes on the nodal lattice.

Replaces the deal.II sparse SpMV consumed by the reference CG solvers
(`linear_elasticity.cc:536-555` CG loop; assembly `:276-345`) for the
degree-2 fine level of the geometric multigrid preconditioner.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace
from .structured import _grid_shape, make_structured_operator
from .pallas_structured import _I0, _PALLAS_OK, _make_slab_kernel_3d

if _PALLAS_OK:  # pragma: no branch - mirrors pallas_structured's probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _phase_element_matrix(E: np.ndarray, swap: bool) -> np.ndarray:
    """(81,81) canonical Q2 element matrix (node-major, slot order
    s = c*9 + b*3 + a over grid axes (z, y, x), x fastest) -> the
    (8*24, 8*24) Q1-view matrix over (slot offset in {0,1}^3, phase, comp)
    with kernel channel layout ch = phase*3 + comp and kernel slot order
    (z, A, L) matching `_make_slab_kernel_3d`'s `slots`."""
    dim = 3
    offs = []
    for c in range(3):
        for b in range(3):
            for a in range(3):
                # canonical per-axis offsets (z=c, y=b, x=a); kernel axes
                # are (z, A, L) = (z, x, y) when the caller swaps the
                # in-plane axes to put the longer extent on lanes
                offs.append((c, a, b) if swap else (c, b, a))
    nch = 8 * dim

    def enc(off):
        oz, oA, oL = off
        soff = (oz // 2) * 4 + (oA // 2) * 2 + (oL // 2)
        ph = ((oz % 2) * 2 + (oA % 2)) * 2 + (oL % 2)
        return soff, ph

    Et = np.zeros((8 * nch, 8 * nch))
    for s, os_ in enumerate(offs):
        ss, phs = enc(os_)
        for t, ot in enumerate(offs):
            st, pht = enc(ot)
            rs = ss * nch + phs * dim
            ct = st * nch + pht * dim
            Et[rs : rs + dim, ct : ct + dim] += E[
                s * dim : s * dim + dim, t * dim : t * dim + dim
            ]
    return Et


@dataclasses.dataclass(frozen=True)
class PallasQ2PhaseOperator:
    """Phase-split slab-fused Q2 structured operator (3D): same call
    surface as StructuredOperator. I/O in `dtype_name` (f32 or bf16),
    accumulation in f32 (f64 under interpret tests)."""

    E_host: tuple  # hashable host copy of the (81,81) element matrix
    grid_shape: Tuple[int, ...]  # (nz, ny, nx) node lattice, slowest first
    dtype_name: str
    slab: int = 2
    interpret: bool = False

    def _E(self) -> np.ndarray:
        return np.asarray(self.E_host, dtype=np.float64)

    @functools.cached_property
    def _apply(self):
        dim = 3
        dtype = jnp.dtype(self.dtype_name)
        cdtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
        nz, ny, nx = self.grid_shape
        CZ, CY, CX = (nz - 1) // 2, (ny - 1) // 2, (nx - 1) // 2
        swap = ny > nx  # longer in-plane extent on the lane (last) axis
        CA, CL = (CX, CY) if swap else (CY, CX)
        Et = _phase_element_matrix(self._E(), swap)
        nch = 24
        # phase-cell lattice: Pz "node" planes of (PA, PL)
        Pz, PA, PL = CZ + 1, CA + 1, CL + 1
        B = max(1, min(self.slab, Pz - 1))
        n_steps = -(-Pz // B)  # cdiv over phase node planes
        z_pad = n_steps * B + 1
        kernel = _make_slab_kernel_3d(Et, PA, PL, CZ, B, dtype, cdtype, nch)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nch, n_steps * B, PA, PL), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (nch, B, PA, PL),
                    lambda k: (_I0, k, _I0, _I0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nch, 1, PA, PL),
                    lambda k: (_I0, (k + np.int32(1)) * np.int32(B), _I0, _I0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (nch, B, PA, PL),
                lambda k: (_I0, k, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((nch, PA, PL), cdtype)],
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

        def apply(u):
            ug = u.reshape((nz, ny, nx, dim))
            ut = jnp.moveaxis(ug, -1, 0).astype(dtype)  # (dim, z, y, x)
            if swap:
                ut = ut.transpose(0, 1, 3, 2)  # (dim, z, A, L)
            # phase split: pad every axis to even, reshape (P*, 2) pairs
            ut = jnp.pad(ut, ((0, 0), (0, 1), (0, 1), (0, 1)))
            v = ut.reshape(dim, Pz, 2, PA, 2, PL, 2)
            v = v.transpose(2, 4, 6, 0, 1, 3, 5).reshape(nch, Pz, PA, PL)
            v = jnp.pad(v, ((0, 0), (0, z_pad - Pz), (0, 0), (0, 0)))
            out = call(v, v)[:, :Pz]
            # interleave phases back onto the nodal lattice
            o = out.reshape(2, 2, 2, dim, Pz, PA, PL)
            o = o.transpose(3, 4, 0, 5, 1, 6, 2)
            o = o.reshape(dim, 2 * Pz, 2 * PA, 2 * PL)
            o = o[:, : 2 * CZ + 1, : 2 * CA + 1, : 2 * CL + 1]
            if swap:
                o = o.transpose(0, 1, 3, 2)
            return jnp.moveaxis(o, 0, -1).reshape(-1, dim)

        return apply

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._apply(u).astype(u.dtype)

    def diagonal(self) -> jnp.ndarray:
        """Assembled diagonal (host-computed once, device constant)."""
        E = self._E()
        dim = 3
        d = np.diag(E).reshape(27, dim)
        nz, ny, nx = self.grid_shape
        reps_rev = ((nz - 1) // 2, (ny - 1) // 2, (nx - 1) // 2)
        out = np.zeros((nz, ny, nx, dim))
        si = 0
        for c in range(3):
            for b in range(3):
                for a in range(3):
                    sl = (
                        slice(c, c + (reps_rev[0] - 1) * 2 + 1, 2),
                        slice(b, b + (reps_rev[1] - 1) * 2 + 1, 2),
                        slice(a, a + (reps_rev[2] - 1) * 2 + 1, 2),
                    )
                    out[sl] += d[si]
                    si += 1
        return jnp.asarray(
            out.reshape(-1, dim), dtype=jnp.dtype(self.dtype_name)
        )


def pallas_q2_supported(space: DofSpace, dtype) -> bool:
    """Gate: TPU backend, Q2, 3D, f32/bf16 (same rationale as
    `pallas_q1_supported`; 2D Q2 stays on the XLA path — the fine level
    cost is a 3D-bench problem)."""
    if not _PALLAS_OK:
        return False
    if space.mesh.degree != 2 or space.dim != 3:
        return False
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def make_pallas_q2_operator(
    space: DofSpace,
    E: np.ndarray,
    dtype=jnp.float32,
    slab: int = 2,
    interpret: bool = False,
) -> PallasQ2PhaseOperator:
    E = np.asarray(E, dtype=np.float64)
    return PallasQ2PhaseOperator(
        E_host=tuple(tuple(row) for row in E),
        grid_shape=_grid_shape(space),
        dtype_name=str(jnp.dtype(dtype)),
        slab=slab,
        interpret=interpret,
    )


def make_q2_operator_auto(
    space: DofSpace,
    E: np.ndarray,
    dtype=jnp.float32,
    precision: str = "default",
    use_pallas: bool = True,
):
    """Degree-dispatched structured operator for the MG fine level:
    phase-split Pallas Q2 kernel when supported, the Q1 slab Pallas kernel
    for degree-1 spaces, XLA structured formulation otherwise. Every path
    applies the identical per-cell arithmetic (f32), so callers need no
    behavioral switch."""
    if space.mesh.degree == 1:
        # degree-1 spaces take the Q1 slab kernel (pallas_structured),
        # which has its own support gate and XLA fallback
        from .pallas_structured import make_structured_operator_auto

        return make_structured_operator_auto(
            space, E, dtype, precision, use_pallas
        )
    if use_pallas and pallas_q2_supported(space, dtype):
        from ..utils.tunecache import pallas_healthy

        if not pallas_healthy():
            # Mosaic compiles are down for this process — the XLA
            # structured formulation is the measured v5e winner anyway
            return make_structured_operator(space, E, dtype, precision)
        winner = _autotune_q2_backend(space, E, dtype, precision)
        if winner == "pallas":
            try:
                from ..utils import tunecache
                from ..utils.phases import phase

                phase("q2 phase kernel: compiling build-time probe")
                op = make_pallas_q2_operator(space, E, dtype)
                # build-time smoke test on the real shape: an unsupported
                # Mosaic lowering falls back here instead of failing inside
                # the enclosing model jit
                probe = jnp.zeros((space.n_nodes, space.dim), dtype=dtype)
                tunecache.probe_with_retry(
                    lambda: jax.block_until_ready(op(probe))
                )
                phase("q2 phase kernel: probe OK (kernel taken)")
                return op
            except Exception as e:  # noqa: BLE001 - lowering failure -> XLA
                # the fallback silently reverts the fine level to the
                # slower XLA path, so make the degradation diagnosable
                import sys as _sys

                print(
                    "pallas_phase: Q2 phase-split kernel unavailable "
                    f"({type(e).__name__}: {e}); falling back to the XLA "
                    "structured operator for the MG fine level",
                    file=_sys.stderr,
                )
    return make_structured_operator(space, E, dtype, precision)


def _autotune_q2_backend(space, E, dtype, precision) -> str:
    """Empirical fine-proxy backend pick, sidecar-persisted.

    Round-4 hardware A/B at the 1.02M-DoF bench shape (tools/q2_op_ab.py,
    bf16, latency-cancelled): XLA structured 0.59-0.74 ms/apply vs the
    phase-split Pallas kernel 0.92 ms (slab=2; 1.27 at slab=1, 1.15 at
    slab=4) — the round-3 assumption that the XLA path costs ~3.5 ms was
    tunnel-latency pollution, and defaulting the kernel ON regressed the
    bench 0.82 -> 0.89 s/step. Which formulation wins is a hardware-
    generation question, so measure at the actual shape once and persist
    (the kernels' source fingerprint keys the record: editing a kernel
    re-measures instead of trusting a stale winner)."""
    import os as _os
    import sys as _sys

    from . import pallas_structured as _ps
    from ..utils import tunecache
    from ..utils.devtime import time_op_on_device
    from ..utils.phases import phase

    if space.n_nodes * space.dim < 200_000:
        # small problems: the fine proxy is not the cost center and the
        # two chained-compile measurements would dominate setup — take the
        # measured-at-scale default (XLA structured on v5e)
        return "xla"
    import sys as _m

    fp = tunecache.source_fingerprint(_m.modules[__name__], _ps)
    skey = tunecache.hardware_key(
        "q2_fine",
        "x".join(map(str, _grid_shape(space))),
        str(jnp.dtype(dtype)),
        fp,
    )
    remeasure = bool(_os.environ.get("MG_AUTOTUNE_REMEASURE"))
    if not remeasure:
        rec = tunecache.load("q2_fine_backend", skey)
        if rec and rec.get("winner") in ("xla", "pallas"):
            phase(f"q2 fine-proxy autotune: sidecar hit -> {rec['winner']}")
            return rec["winner"]
    if _os.environ.get("BENCH_LAST_ATTEMPT") == "1":
        # the bench's final retry: two earlier attempts died somewhere in
        # setup (wedged remote compile RPCs), so do not risk the optional
        # measurement again — take the measured-at-scale prior (XLA won on
        # v5e at the 1M-DoF bench shape; see docstring)
        phase("q2 fine-proxy autotune: final attempt -> prior (xla)")
        return "xla"
    # REMEASURE is the documented escape hatch: it must bypass not only
    # the winner record but also the inflight breadcrumb and the banked
    # candidate measurements, or a stale done=False breadcrumb makes
    # re-measuring impossible for that key (advisor finding, round 4)
    inflight = None if remeasure else tunecache.load("q2_fine_inflight", skey)
    if inflight and not inflight.get("done"):
        # a previous process started this exact measurement and never
        # finished it (wedged remote compile RPC -> phase-deadline abort).
        # Re-entering would die the same way, so take the prior and
        # persist it as the winner — MG_AUTOTUNE_REMEASURE re-measures.
        print(
            "q2 autotune: previous attempt died inside this measurement; "
            "taking the prior (xla) without re-measuring",
            file=_sys.stderr,
        )
        tunecache.store(
            "q2_fine_backend", skey,
            dict(winner="xla",
                 note="prior: measurement wedged in a previous process"),
        )
        return "xla"
    tunecache.store("q2_fine_inflight", skey, dict(done=False))

    results = {}
    t_budget = float(_os.environ.get("MG_AUTOTUNE_BUDGET_S", "240"))
    import time as _time

    # bank each candidate's measurement the moment it lands: a cold
    # tunnel compile can push one candidate past the bench's phase
    # deadline, and the rc=75 restart must not re-pay a candidate that
    # already finished (livelock otherwise: every attempt dies inside
    # the same re-measurement)
    def _banked(name, measure):
        ckey = skey + ":" + name
        rec = (
            None if remeasure else tunecache.load("q2_fine_candidate", ckey)
        )
        if rec is not None:
            if "seconds" in rec:
                results[name] = float(rec["seconds"])
            return
        try:
            results[name] = measure()
            tunecache.store(
                "q2_fine_candidate", ckey, dict(seconds=results[name])
            )
        except Exception as e:  # noqa: BLE001 - must not fail setup
            print(
                f"q2 autotune: {name} failed ({type(e).__name__})",
                file=_sys.stderr,
            )
            if not tunecache.transient_failure(str(e)):
                tunecache.store(
                    "q2_fine_candidate", ckey, dict(error=str(e)[:200])
                )

    t0 = _time.perf_counter()
    _banked(
        "xla",
        lambda: time_op_on_device(
            make_structured_operator(space, E, dtype, precision),
            space.n_nodes, space.dim, dtype,
        ),
    )
    if _time.perf_counter() - t0 < t_budget:
        _banked(
            "pallas",
            lambda: time_op_on_device(
                make_pallas_q2_operator(space, E, dtype),
                space.n_nodes, space.dim, dtype,
            ),
        )
    else:
        print(
            f"q2 autotune: budget ({t_budget:.0f}s) exhausted before the "
            "pallas candidate; keeping xla",
            file=_sys.stderr,
        )
    tunecache.store("q2_fine_inflight", skey, dict(done=True))
    if not results:
        return "xla"
    winner = min(results, key=results.get)
    timings = ", ".join(
        f"{n}={t*1e3:.2f}ms"
        for n, t in sorted(results.items(), key=lambda kv: kv[1])
    )
    print(
        f"q2 fine-proxy autotune @ {space.n_nodes} nodes "
        f"{jnp.dtype(dtype).name}: {timings} -> {winner}",
        file=_sys.stderr,
    )
    tunecache.store(
        "q2_fine_backend",
        skey,
        dict(
            winner=winner,
            n_nodes=space.n_nodes,
            timings_ms={n: round(t * 1e3, 4) for n, t in results.items()},
        ),
    )
    return winner


__all__ = [
    "PallasQ2PhaseOperator",
    "make_pallas_q2_operator",
    "make_q2_operator_auto",
    "pallas_q2_supported",
]
