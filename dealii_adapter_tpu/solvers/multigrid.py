"""Matrix-free geometric multigrid preconditioner on structured lattices.

The decisive solver upgrade over the reference (CG + SSOR,
`linear_elasticity.cc:536-555`): on structured tensor-product meshes,
coarsening, transfers and coarse operators are all trivial —

* level 0: the Q_p operator of the model (structured backend)
* level 1: Q1 rediscretization on the same cell lattice (p-coarsening)
* level >= 2: Q1 on cell counts halved per axis (h-coarsening), down to a
  dense-Cholesky coarse solve
* transfers: 1D linear interpolation matrices per axis (GLL-aware on the
  fine level), applied separably as three small einsums — O(n) with tiny
  constants; restriction is the exact transpose so the symmetric V-cycle
  stays SPD for use inside CG
* smoother: Chebyshev polynomial on the Jacobi-scaled level operator
  (upper-spectrum damping), entirely matrix-free

Every level op is the same batched element matvec the models already use,
so the whole V-cycle jits into one XLA program with zero host syncs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace
from ..mesh.generator import StructuredMesh, subdivided_hyper_rectangle
from ..ops.element_ops import ElementMatrices, assemble_dense, assemble_diagonal
from ..ops.structured import make_structured_operator
from ..utils import tunecache as _tc


# process-wide Q1 level-operator autotune results, keyed by
# (dtype, use_pallas) and valued (winner, n_nodes_measured): one
# measurement per process covers with_delta_t clones, coarser levels and
# repeated hierarchies; a strictly larger level than the one measured
# re-tunes (the winner is a lane/tile-layout question, so the largest
# shape is the representative one)
_AUTOTUNE_CACHE: dict = {}


def _time_op_on_device(
    op, n_nodes: int, dim: int, dtype, chain: int = 6, chain_long: int = 26
):
    """Seconds per operator application, latency-cancelled (see
    utils/devtime.py — scan-based chains, so each candidate costs two
    body compiles instead of an unrolled 26-op program)."""
    from ..utils.devtime import time_op_on_device

    return time_op_on_device(op, n_nodes, dim, dtype, chain, chain_long)


def _autotune_q1_backend(space_c, E_c, dtype, use_pallas: bool) -> str:
    """Pick the fastest Q1 level-operator backend by measuring each
    candidate ON THE CURRENT DEVICE at the actual level shape.

    The V-cycle's Q1 level operators are the dominant per-CG-iteration
    cost at bench scale, and which formulation wins (per-cell Pallas slab
    kernel vs the stencil's shift / conv / banded-MXU / lane-flattened
    interior passes) is a hardware-generation question — so "auto" on TPU
    answers it empirically at setup time (seconds, outside any timed
    region) instead of hardcoding one generation's measurement.
    """
    import sys as _sys

    # one measurement per (dtype, use_pallas) per process: levels are
    # built fine -> coarse, so the first call is the largest (most
    # representative) shape, and re-tuning every smaller level would add
    # minutes of compile time on the slow axon tunnel for ops that are a
    # minority of the V-cycle cost. If a LARGER level than the measured
    # one shows up later (a bigger model built in the same process), the
    # cached winner is no longer representative — re-measure.
    key = (str(jnp.dtype(dtype)), use_pallas)
    hit = _AUTOTUNE_CACHE.get(key)
    if hit is not None and space_c.n_nodes <= hit[1]:
        return hit[0]

    import os as _os
    import time as _time

    # persistent sidecar (round-3 driver-bench post-mortem): the winner is
    # a property of the TPU generation + layout question, not of the
    # process, so a fresh driver-spawned bench must NOT re-pay the 7x2
    # chained-program compiles. Keyed by device kind + jax version +
    # dtype/pallas; a hit at >= this level's size short-circuits setup.
    from ..utils import tunecache

    skey = tunecache.hardware_key(
        "mg_q1", str(jnp.dtype(dtype)), f"pallas={use_pallas}"
    )
    if not _os.environ.get("MG_AUTOTUNE_REMEASURE"):
        rec = tunecache.load("mg_q1_backend", skey)
        if rec and space_c.n_nodes <= rec.get("n_nodes", 0):
            winner = rec["winner"]
            if winner == "pallas" and not tunecache.pallas_healthy():
                # Mosaic compiles are down for this process: demote to
                # the best measured non-Pallas candidate (the sidecar
                # record keeps every candidate's timing) instead of
                # crashing the step-program compile
                timings = rec.get("timings_ms") or {}
                alts = {n: t for n, t in timings.items() if n != "pallas"}
                winner = (
                    min(alts, key=alts.get) if alts else "stencil_vmem"
                )
                print(
                    f"mg autotune: sidecar winner pallas unusable "
                    f"(unhealthy Mosaic helper) -> {winner}",
                    file=_sys.stderr,
                )
                _AUTOTUNE_CACHE[key] = (winner, rec["n_nodes"])
                return winner
            print(
                f"mg autotune: sidecar hit ({skey} @ {rec['n_nodes']} "
                f"nodes) -> {winner}",
                file=_sys.stderr,
            )
            _AUTOTUNE_CACHE[key] = (winner, rec["n_nodes"])
            return winner

    # ordered by prior on winning (vmem keeps the whole field in VMEM and
    # touches HBM once per apply — by construction the closest to
    # speed-of-light; pallas slab = round-2's measured best of the rest)
    # so the wall-clock budget below cuts the least-likely candidates:
    # compile time on the tunneled TPU is the real cost of tuning, and a
    # driver-run bench must never stall in setup
    candidates = {}
    from ..ops.stencil import make_q1_stencil_operator

    candidates["stencil_vmem"] = lambda: make_q1_stencil_operator(
        space_c, E_c, dtype, strategy="vmem"
    )
    if use_pallas and tunecache.pallas_healthy():
        from ..ops.pallas_structured import make_structured_operator_auto

        candidates["pallas"] = lambda: make_structured_operator_auto(
            space_c, E_c, dtype, precision="default"
        )

    for strat in ("banded", "flatx", "flat", "conv", "shift"):
        name = "stencil" if strat == "shift" else f"stencil_{strat}"
        candidates[name] = (
            lambda strat=strat: make_q1_stencil_operator(
                space_c, E_c, dtype, strategy=strat
            )
        )

    # wall-clock budget INCLUDING candidate compile time (each candidate's
    # `_time_op_on_device` jit-compiles two chained programs — on the
    # tunneled TPU the compiles, not the measurements, are the real cost):
    # the elapsed clock is checked before every candidate, and the
    # per-candidate timer prints compile+measure cost so overruns are
    # attributable in a killed run's log tail. A budget too small to
    # measure anything returns the prior-ordered default instead of
    # stalling setup.
    budget_s = float(_os.environ.get("MG_AUTOTUNE_BUDGET_S", "240"))
    t_start = _time.perf_counter()
    dim = space_c.dim
    results = {}
    for name, build in candidates.items():
        elapsed = _time.perf_counter() - t_start
        if elapsed > budget_s:
            print(
                f"mg autotune: budget ({budget_s:.0f}s) exhausted after "
                f"{elapsed:.0f}s, skipping {name} and later candidates",
                file=_sys.stderr,
            )
            break
        t_c = _time.perf_counter()
        try:
            t = _time_op_on_device(build(), space_c.n_nodes, dim, dtype)
            results[name] = t
            print(
                f"mg autotune: {name} = {t*1e3:.2f} ms/apply "
                f"(compile+measure {_time.perf_counter() - t_c:.0f}s)",
                file=_sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — a candidate may be
            # unavailable (e.g. Pallas off-TPU); tuning must not fail setup
            print(
                f"mg autotune: {name} failed ({type(e).__name__})",
                file=_sys.stderr,
            )
    if not results:
        # nothing measured inside the budget: fall back to the strongest
        # prior (round-3 hardware: the Pallas slab at 0.07 ms/apply)
        if use_pallas and tunecache.pallas_healthy():
            return "pallas"
        return "stencil"
    winner = min(results, key=results.get)
    timings = ", ".join(
        f"{n}={t*1e3:.2f}ms" for n, t in sorted(results.items(), key=lambda kv: kv[1])
    )
    print(
        f"mg autotune @ {space_c.n_nodes} nodes {jnp.dtype(dtype).name}: "
        f"{timings} -> {winner}",
        file=_sys.stderr,
    )
    _AUTOTUNE_CACHE[key] = (winner, space_c.n_nodes)
    tunecache.store(
        "mg_q1_backend",
        skey,
        dict(
            winner=winner,
            n_nodes=space_c.n_nodes,
            timings_ms={n: round(t * 1e3, 4) for n, t in results.items()},
        ),
    )
    return winner


def _interp_1d(x_fine: np.ndarray, x_coarse: np.ndarray) -> np.ndarray:
    """(n_fine, n_coarse) linear interpolation matrix: hat functions on the
    coarse 1D grid evaluated at the fine nodes."""
    P = np.zeros((len(x_fine), len(x_coarse)))
    for i, x in enumerate(x_fine):
        j = np.searchsorted(x_coarse, x) - 1
        j = min(max(j, 0), len(x_coarse) - 2)
        t = (x - x_coarse[j]) / (x_coarse[j + 1] - x_coarse[j])
        t = min(max(t, 0.0), 1.0)
        P[i, j] = 1.0 - t
        P[i, j + 1] = t
    return P


def _apply_sep(
    u_grid: jnp.ndarray,
    mats: Tuple[jnp.ndarray, ...],
    minor_first: bool = False,
) -> jnp.ndarray:
    """Apply one (n_out_ax, n_in_ax) matrix per grid axis (slowest first)
    to a (..., dim) lattice field — separable tensor-product transfer.

    The per-axis contractions commute; `minor_first` controls the order,
    which only affects intermediate sizes: restriction SHRINKS every axis,
    so contracting minor axes first keeps the later (major-axis)
    contractions on already-coarsened arrays; prolongation grows every
    axis, so major-first keeps the early contractions on the small coarse
    array. (HLO census note: the sharded-step full-level all-gather is
    caused by the residual's phase-view patch extraction, not by these
    transfers — see tests/test_sharding_scale.py.)
    """
    ndim = len(mats)
    out = u_grid
    order = reversed(range(ndim)) if minor_first else range(ndim)
    for ax in order:
        out = jnp.moveaxis(
            jnp.tensordot(mats[ax], out, axes=(1, ax)), 0, ax
        )
    return out


def _boundary_mask(mesh: StructuredMesh, tags: dict) -> np.ndarray:
    """(n_nodes, dim) Dirichlet mask for a level mesh. Coarse level meshes
    carry *raw colorize* boundary ids (they are never scenario-relabeled),
    so the mask is derived from the raw face ids the scenario recorded
    (`clamped_raw_ids` / `oop_raw_ids` from make_scenario_grid)."""
    space = DofSpace.create(mesh)
    mask = np.ones((space.n_nodes, mesh.dim))
    clamped_ids = tags.get("clamped_raw_ids", [tags.get("clamped")])
    matched = False
    for bid in clamped_ids:
        if bid in space.boundary_nodes:
            mask[space.boundary_nodes[bid], :] = 0.0
            matched = True
    if not matched:
        # A custom tags dict without `clamped_raw_ids` carries
        # scenario-relabeled ids that coarse (raw-colorized) meshes do not
        # have; a silently empty mask would degrade MG convergence with no
        # error, so fail loudly instead.
        raise ValueError(
            f"MG level mask: none of the clamped boundary ids {clamped_ids} "
            f"match a boundary set on the level mesh (available: "
            f"{sorted(space.boundary_nodes)}). Pass 'clamped_raw_ids' (raw "
            f"colorize face ids, as recorded by make_scenario_grid) in the "
            f"tags dict when using preconditioner='MG' with a custom mesh."
        )
    if mesh.dim == 3:
        for bid in tags.get("oop_raw_ids", []):
            if bid in space.boundary_nodes:
                mask[space.boundary_nodes[bid], 2] = 0.0
    return mask


@dataclasses.dataclass
class _LevelGeom:
    """dt-independent host-side geometry of one coarse MG level: meshes,
    DoF spaces, masks, element stiffness/unit-mass blocks, diagonals split
    K/M, 1D transfers from the previous (finer) level, and (coarsest level
    only) dense K/M matrices. The level operator is E_c = mu * K_e_unit +
    mass_coeff * M_e_unit with (mu, mass_coeff) the only dt-dependent
    inputs, so `with_delta_t` solver clones (fractional coupling windows)
    reuse this skeleton and rebuild only operators/diagonals/lam_max/
    Cholesky."""

    m_c: StructuredMesh
    space_c: DofSpace
    mask_c: np.ndarray
    K_e_unit: np.ndarray  # stiffness at (lmbda/mu, mu=1): scale by mu
    M_e_unit: np.ndarray  # consistent mass at rho=1: scale by mass_coeff
    diag_K: np.ndarray
    diag_M: np.ndarray
    P_1d: Tuple[np.ndarray, ...]
    shape_c: Tuple[int, ...]
    K_dense: Optional[np.ndarray] = None
    M_dense: Optional[np.ndarray] = None


def _geometry_skeleton(
    mesh: StructuredMesh,
    tags: dict,
    coarse_size: int,
    fem_sem: bool,
    lmbda: float,
    mu: float,
) -> List[_LevelGeom]:
    """Build (or fetch from the per-mesh cache) the coarse-level geometry
    skeleton. Cached on the fine mesh object: every dt-clone of a model on
    the same mesh (`with_delta_t`, `adapter.h:104-107` subcycling headroom)
    shares one skeleton instead of re-creating DoF spaces, transfers and
    element blocks per dt. K_e is jointly linear in (lmbda, mu), and the
    linear model passes dt-SCALED Lame parameters ((theta dt)^2 lmbda), so
    the key uses only the ratio lmbda/mu and stores the unit-mu stiffness —
    dt-clones of either model family share one skeleton."""
    if mu <= 0.0:
        raise ValueError(f"multigrid requires a positive shear modulus, got mu={mu}")
    key = (
        coarse_size,
        fem_sem,
        float(lmbda / mu),
        tuple(sorted(tags.get("clamped_raw_ids", [tags.get("clamped")]))),
        tuple(sorted(tags.get("oop_raw_ids", []))),
    )
    cache = mesh.__dict__.setdefault("_mg_geom_cache", {})
    if key in cache:
        return cache[key]

    dim = mesh.dim
    # build the Q1 hierarchy: same reps first (p-coarsening), then halve
    # per axis with rounding — levels need not nest, the coordinate-based
    # 1D interpolation handles non-nested lattices exactly
    meshes = []
    reps = mesh.reps
    if mesh.degree > 1:
        if fem_sem:
            # FEM-SEM low-order level: Q1 on a lattice with the SAME
            # node count as the Q_p space (spectrally equivalent,
            # Orszag '80) — near-identity 0->1 transfer, but the level
            # costs MORE per matvec than the fine Q_p level (one Q1
            # cell per fine node), so it roughly doubles V-cycle time
            reps = tuple(r * mesh.degree for r in reps)
        else:
            # combined p+h coarsening (deal.II hybrid-MG style): first
            # coarse level is Q1 at half the fine node resolution —
            # slightly weaker two-level rate, ~2x cheaper V-cycle
            reps = tuple(max(1, (r * mesh.degree + 1) // 2) for r in reps)
        meshes.append(subdivided_hyper_rectangle(reps, mesh.p0, mesh.p1, 1))
        if meshes[-1].n_nodes * dim <= coarse_size:
            reps = None  # Q1 level already small enough
    extent = np.array(mesh.p1, dtype=float) - np.array(mesh.p0, dtype=float)
    while reps is not None and any(r > 1 for r in reps):
        # aspect-aware semi-coarsening: halve only the axes whose cell
        # spacing is close to the finest (strongest coupling); a point
        # smoother cannot damp errors along weakly-coupled (large-h)
        # directions, so isotropic halving of an anisotropic lattice
        # (the PF flap is ~9:1 in z) destroys the V-cycle contraction.
        # Axes equalize over the levels, then all halve together.
        h = extent / np.array(reps, dtype=float)
        hmin = min(h_d for h_d, r in zip(h, reps) if r > 1)
        new_reps = tuple(
            max(1, (r + 1) // 2) if (r > 1 and h_d <= 1.9 * hmin) else r
            for r, h_d in zip(reps, h)
        )
        if new_reps == reps:  # defensive: never stall the hierarchy
            new_reps = tuple(max(1, (r + 1) // 2) for r in reps)
        reps = new_reps
        meshes.append(subdivided_hyper_rectangle(reps, mesh.p0, mesh.p1, 1))
        if meshes[-1].n_nodes * dim <= coarse_size:
            break

    geoms: List[_LevelGeom] = []
    prev_mesh = mesh
    for li, m_c in enumerate(meshes):
        space_c = DofSpace.create(m_c)
        # unit-mu stiffness + unit-rho mass; scaled by mu / mass_coeff at
        # use (both element matrices are linear in those coefficients)
        elem = ElementMatrices(space_c, lmbda / mu, 1.0, 1.0)
        mask_c = _boundary_mask(m_c, tags)
        P_1d = tuple(
            _interp_1d(prev_mesh.axis_coords[d], m_c.axis_coords[d])
            # grid axes are slowest-first => reverse the axis order
            for d in reversed(range(dim))
        )
        shape_c = tuple(reversed([m_c.reps[d] + 1 for d in range(dim)]))
        is_last = li == len(meshes) - 1
        K_dense = M_dense = None
        if is_last and space_c.n_nodes * dim <= 32768:
            K_dense = assemble_dense(space_c, elem.K_e)
            M_dense = assemble_dense(space_c, elem.M_e)
        geoms.append(
            _LevelGeom(
                m_c=m_c,
                space_c=space_c,
                mask_c=mask_c,
                K_e_unit=elem.K_e,
                M_e_unit=elem.M_e,
                diag_K=np.asarray(assemble_diagonal(space_c, elem.K_e)),
                diag_M=np.asarray(assemble_diagonal(space_c, elem.M_e)),
                P_1d=P_1d,
                shape_c=shape_c,
                K_dense=K_dense,
                M_dense=M_dense,
            )
        )
        prev_mesh = m_c
    cache[key] = geoms
    return geoms


@dataclasses.dataclass
class MGLevel:
    operator: Callable  # masked SPD action on (n_nodes, dim)
    diag: jnp.ndarray  # masked diagonal (1 on constrained)
    mask: jnp.ndarray
    grid_shape: Tuple[int, ...]  # node lattice, slowest first
    lam_max: float  # upper bound of diag^-1 A spectrum
    # transfers to the NEXT (coarser) level; None on the coarsest
    P_1d: Optional[Tuple[jnp.ndarray, ...]] = None  # fine <- coarse per axis
    R_1d: Optional[Tuple[jnp.ndarray, ...]] = None  # transposes
    coarse_solve: Optional[Callable] = None  # only on the coarsest level


def _chebyshev_smooth(level: MGLevel, b, x, degree: int, x_is_zero=False):
    """`degree` Chebyshev iterations targeting [lam_max/4, lam_max] of the
    Jacobi-scaled operator — damps the upper half-spectrum each visit.
    `x_is_zero=True` skips the initial residual operator apply (resid = b),
    saving one matvec on every pre-smooth."""
    inv = 1.0 / level.diag
    lmax = level.lam_max * 1.05
    lmin = level.lam_max / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    resid = b if x_is_zero else b - level.operator(x)
    d = (1.0 / theta) * (inv * resid)
    sigma = theta / delta
    rho = 1.0 / sigma
    for _ in range(degree):
        x = x + d
        resid = resid - level.operator(d)
        rho_next = 1.0 / (2.0 * sigma - rho)
        d = rho_next * rho * d + (2.0 * rho_next / delta) * (inv * resid)
        rho = rho_next
    return x + d


class GeometricMultigrid:
    """Symmetric V-cycle preconditioner for the structured models.

    Built from the fine mesh + Lame/Newmark coefficients; `__call__(r)` is
    a pure jittable function (one V-cycle) usable directly as the `cg_solve`
    preconditioner.
    """

    def __init__(
        self,
        mesh: StructuredMesh,
        tags: dict,
        fine_operator: Callable,
        fine_diag: jnp.ndarray,
        fine_mask: jnp.ndarray,
        lmbda: float,
        mu: float,
        mass_coeff: float = 0.0,
        smooth_degree: int = 2,
        smooth_degree_fine: int = 0,
        coarse_size: int = 4000,
        dtype=jnp.float64,
        fine_lam_max: Optional[float] = None,
        fem_sem: bool = True,
        use_pallas: bool = False,
        skip_fine_smoothing: bool = False,
        device_mesh=None,
        shard_axis: str = "shards",
        level_backend: str = "auto",
        fine_fp: Optional[str] = None,
    ):
        """`fine_operator` must already be BC-masked (identity on
        constrained DoFs); `mass_coeff` is the rho-scaled coefficient of the
        mass term in the operator (theta^2 dt^2 rho for the linear model's
        stepping matrix, alpha_1 rho for Newmark) so coarse rediscretized
        operators include the same reaction term."""
        self.dtype = dtype
        self.smooth_degree = smooth_degree
        # optional weaker smoothing on the finest level only: with a
        # FEM-SEM first coarse level at the SAME resolution, the fine
        # Chebyshev overlaps spectrally with the Q1 level's smoother, so
        # the fine level can often run 1-2 degrees cheaper (it is the most
        # expensive level to smooth). 0 = same as smooth_degree.
        self.smooth_degree_fine = smooth_degree_fine or smooth_degree
        # classic FEM-SEM preconditioning: with a same-resolution Q1 first
        # coarse level, fine-level smoothing is spectrally redundant — the
        # Q1 level can smooth the whole upper spectrum. Skipping the fine
        # smoother removes all Q_p operator applies from the V-cycle
        # (P^T M_sem P stays SPD, so CG remains valid).
        self.skip_fine_smoothing = skip_fine_smoothing and fem_sem and (
            mesh.degree > 1
        )
        dim = mesh.dim

        levels: List[MGLevel] = []

        def lam_est(op, diag, shape, fp=None):
            """Power-iteration lam_max, sidecar-cached when `fp` (a content
            fingerprint of the operator's defining data) is given: the
            estimate is a deterministic property of (operator, diag, seed),
            so a fresh process skips the per-level compile + dispatch — at
            bench scale the eager lam_max programs were a measurable slice
            of the 10-minute model-build phase (round-4 forensics). The
            cached float round-trips JSON exactly, keeping the baked
            Chebyshev constants (and thus the step program's HLO) bit-stable
            across processes — which also stabilizes the .jax_cache key of
            the big step program."""
            from ..utils import tunecache
            from .cg import estimate_lambda_max

            skey = None
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:  # noqa: BLE001
                on_tpu = False
            # TPU-only: the win is tunnel-bound compile/dispatch cost, and
            # CPU test runs must not dirty the committed sidecar
            if fp is not None and on_tpu:
                skey = tunecache.hardware_key(
                    "lam_max", fp, "x".join(map(str, shape)),
                    str(jnp.dtype(diag.dtype)),
                )
                rec = tunecache.load("mg_lam_max", skey)
                if rec and "lam_max" in rec:
                    return float(rec["lam_max"])
            val = float(estimate_lambda_max(op, diag, shape))
            if skey is not None:
                tunecache.store("mg_lam_max", skey, dict(lam_max=val))
            return val

        from ..utils.phases import phase

        fine_shape = tuple(
            reversed([mesh.reps[d] * mesh.degree + 1 for d in range(dim)])
        )
        phase("mg: estimating fine-level lam_max")
        levels.append(
            MGLevel(
                operator=fine_operator,
                diag=fine_diag,
                mask=fine_mask,
                grid_shape=fine_shape,
                lam_max=fine_lam_max
                or lam_est(
                    fine_operator,
                    fine_diag,
                    (int(np.prod(fine_shape)), dim),
                    # content identity of the BC-masked fine operator,
                    # computed HOST-SIDE by the caller (round-4 forensics:
                    # fingerprinting the device-resident diag cost a
                    # 2 MB device->host readback that the axon tunnel
                    # served slower than the power iteration it replaces)
                    fp=("fine-" + fine_fp) if fine_fp else None,
                ),
            )
        )
        phase("mg: building geometry skeleton (level meshes/transfers)")

        # dt-independent geometry skeleton (level meshes, DoF spaces,
        # masks, K/unit-M element blocks, transfers, dense coarse K/M) —
        # cached on the fine mesh so `with_delta_t` clones share it; only
        # the dt-dependent pieces below (operators with the mass_coeff
        # reaction term, diagonals, lam_max, coarse Cholesky) are rebuilt
        # per dt.
        geoms = _geometry_skeleton(
            mesh, tags, coarse_size, fem_sem, lmbda, mu
        )
        for li, gm in enumerate(geoms):
            phase(f"mg: building level {li + 1}/{len(geoms)}")
            m_c, space_c = gm.m_c, gm.space_c
            E_c = mu * gm.K_e_unit + mass_coeff * gm.M_e_unit
            mask_c = jnp.asarray(gm.mask_c, dtype=dtype)
            # preconditioner-internal op: default (fast bf16-pass) precision
            # suffices inside the V-cycle smoother. Backend selection for
            # the Q1 level operator (the dominant V-cycle cost):
            #   "stencil": assembled 27-point stencil (ops/stencil.py) —
            #     243 FMA/node fused into one XLA elementwise pass
            #   "pallas": slab-fused per-cell kernel (pallas_structured)
            #   "xla": per-cell extract -> MXU matmul -> overlap-add
            #   "auto": on TPU, AUTOTUNE — measure every candidate at the
            #     actual level shape and keep the fastest (v5e reference
            #     point at the 1M-node lattice: pallas slab 0.96 ms,
            #     stencil shift 1.50 ms; conv/banded/flat are newer MXU/
            #     lane layouts whose winner is hardware-generation
            #     dependent). Off-TPU: pallas if use_pallas else stencil.
            backend = level_backend
            _known = (
                "auto", "xla", "pallas", "stencil", "stencil_conv",
                "stencil_banded", "stencil_flat", "stencil_flatx",
                "stencil_vmem",
            )
            if backend not in _known:
                # a typo would otherwise silently fall through to the
                # slowest per-cell XLA formulation
                raise ValueError(
                    f"unknown mg_level_backend {backend!r}; "
                    f"expected one of {_known}"
                )
            if backend == "auto":
                if (
                    jax.default_backend() == "tpu"
                    and device_mesh is None
                    and space_c.n_nodes * dim >= 200_000
                ):
                    # measure the candidates on the real chip at this
                    # level's shape (cached process-wide per shape/dtype)
                    backend = _autotune_q1_backend(
                        space_c, E_c, dtype, use_pallas
                    )
                else:
                    hit = _AUTOTUNE_CACHE.get(
                        (str(jnp.dtype(dtype)), use_pallas)
                    )
                    if (
                        jax.default_backend() == "tpu"
                        and device_mesh is None
                        and hit is not None
                    ):
                        # reuse the winner measured at a larger level:
                        # levels build fine -> coarse, and the candidates'
                        # ranking is a layout question that holds (and the
                        # vmem kernel's VMEM budget only loosens) as the
                        # lattice shrinks
                        backend = hit[0]
                    else:
                        # off-TPU / sharded / small levels: fixed heuristic
                        # (pallas auto-falls back to XLA off-TPU; the
                        # stencil beats per-cell XLA when Pallas is
                        # disabled)
                        backend = "pallas" if use_pallas else "stencil"
            if backend.startswith("stencil"):
                from ..ops.stencil import make_q1_stencil_operator

                # "stencil" (shift) | "stencil_conv" | "stencil_banded"
                strat = backend[len("stencil_"):] or "shift"
                op_c_raw = make_q1_stencil_operator(
                    space_c, E_c, dtype, strategy=strat
                )
            elif backend == "pallas":
                from ..ops.pallas_structured import (
                    make_structured_operator_auto,
                )

                op_c_raw = make_structured_operator_auto(
                    space_c, E_c, dtype, precision="default"
                )
            else:
                op_c_raw = make_structured_operator(
                    space_c, E_c, dtype, precision="default"
                )

            def masked(op, mk):
                def apply(v):
                    return mk * op(mk * v) + (1.0 - mk) * v

                return apply

            op_c = masked(op_c_raw, mask_c)
            diag_c = mask_c * jnp.asarray(
                mu * gm.diag_K + mass_coeff * gm.diag_M, dtype=dtype
            ) + (1.0 - mask_c)

            # transfers between prev (finer) and this level (from skeleton)
            P_1d = tuple(jnp.asarray(P, dtype=dtype) for P in gm.P_1d)
            R_1d = tuple(P.T for P in P_1d)
            levels[-1].P_1d = P_1d
            levels[-1].R_1d = R_1d

            shape_c = gm.shape_c
            is_last = li == len(geoms) - 1
            coarse_solve = None
            if is_last:
                n_unknowns = space_c.n_nodes * dim
                if gm.K_dense is None:
                    raise ValueError(
                        f"MG coarse level has {n_unknowns} unknowns; the "
                        f"dense Cholesky coarse solve is O(n^3) on host and "
                        f"is capped at 32768. Lower mg_coarse_size (got "
                        f"coarse_size={coarse_size}) so the hierarchy "
                        f"coarsens further."
                    )
                phase(f"mg: coarse dense Cholesky ({n_unknowns} unknowns)")
                A_dense = mu * gm.K_dense + mass_coeff * gm.M_dense
                flat_mask = np.asarray(mask_c, dtype=np.float64).reshape(-1)
                A_dense = A_dense * flat_mask[:, None] * flat_mask[None, :]
                np.fill_diagonal(
                    A_dense, np.diag(A_dense) + (1.0 - flat_mask)
                )
                L = np.linalg.cholesky(A_dense)
                # the triangular substitutions stay f32 even for a bf16
                # hierarchy: sequential substitution amplifies rounding
                cdt = jnp.float32 if dtype == jnp.bfloat16 else dtype
                L_d = jnp.asarray(L, dtype=cdt)
                # separate device constant: lets XLA keep both triangles
                # without constant-folding a transpose at every compile
                LT_d = jnp.asarray(L.T.copy(), dtype=cdt)

                def coarse_solve(b, L_d=L_d, LT_d=LT_d, n=space_c.n_nodes):
                    y = jax.scipy.linalg.solve_triangular(
                        L_d, b.reshape(-1).astype(L_d.dtype), lower=True
                    )
                    z = jax.scipy.linalg.solve_triangular(
                        LT_d, y, lower=False
                    )
                    return z.astype(b.dtype).reshape(n, dim)

            levels.append(
                MGLevel(
                    operator=op_c,
                    diag=diag_c,
                    mask=mask_c,
                    grid_shape=shape_c,
                    lam_max=lam_est(
                        op_c, diag_c, (space_c.n_nodes, dim),
                        # host-side content identity: element matrix +
                        # Dirichlet mask define the masked level operator
                        fp="lvl-"
                        + _tc.array_fingerprint(E_c)
                        + _tc.array_fingerprint(gm.mask_c),
                    ),
                    coarse_solve=coarse_solve,
                )
            )

        phase(f"mg: hierarchy ready ({len(levels)} levels)")
        self.levels = levels
        self.dim = dim

        # GSPMD lattice sharding: constrain each level's nodal vector to be
        # sharded over the device mesh (XLA inserts halo exchanges for the
        # structured patch slices and reshards across the inter-level
        # transfers); the dense coarse solve is pinned replicated. This is
        # the SPMD scaling path for the V-cycle — the levels' operators are
        # plain jax programs, so the annotations alone partition them.
        self._shards = [None] * len(levels)
        self._replicate = None
        if device_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(list(device_mesh.shape.values())))
            self._replicate = NamedSharding(device_mesh, P(None, None))
            for li, lv in enumerate(levels):
                n_rows = int(np.prod(lv.grid_shape))
                # levels too small to spread stay replicated
                if lv.coarse_solve is None and n_rows >= 4 * n_dev:
                    self._shards[li] = NamedSharding(
                        device_mesh, P(shard_axis, None)
                    )
                else:
                    self._shards[li] = self._replicate

    # ------------------------------------------------------------------

    def _constrain(self, li: int, v):
        s = self._shards[li]
        if s is None:
            return v
        return jax.lax.with_sharding_constraint(v, s)

    def _restrict(self, li: int, r):
        lv = self.levels[li]
        r_grid = r.reshape(lv.grid_shape + (self.dim,))
        rc = _apply_sep(r_grid, lv.R_1d, minor_first=True)
        rc = rc.reshape(-1, self.dim)
        return self._constrain(li + 1, self.levels[li + 1].mask * rc)

    def _prolong(self, li: int, ec):
        lv = self.levels[li]
        ec_grid = ec.reshape(self.levels[li + 1].grid_shape + (self.dim,))
        ef = _apply_sep(ec_grid, lv.P_1d)
        ef = ef.reshape(-1, self.dim)
        return self._constrain(li, lv.mask * ef)

    def _vcycle(self, li: int, b):
        lv = self.levels[li]
        if li == 0 and self.skip_fine_smoothing:
            return self._prolong(0, self._vcycle(1, self._restrict(0, b)))
        if lv.coarse_solve is not None:
            return lv.coarse_solve(b)
        if li == len(self.levels) - 1:  # coarsest without factorization
            return _chebyshev_smooth(
                lv, b, jnp.zeros_like(b), self.smooth_degree * 2,
                x_is_zero=True,
            )
        deg = self.smooth_degree_fine if li == 0 else self.smooth_degree
        x = _chebyshev_smooth(
            lv, b, jnp.zeros_like(b), deg, x_is_zero=True
        )
        r = b - lv.operator(x)
        ec = self._vcycle(li + 1, self._restrict(li, r))
        x = x + self._prolong(li, ec)
        return _chebyshev_smooth(lv, b, x, deg)

    def __call__(self, r):
        """One symmetric V-cycle. Input/output follow the caller's dtype;
        internally everything runs in the hierarchy's `dtype` — building
        with float32 gives a mixed-precision preconditioner (f32 V-cycle
        inside f64 CG), which keeps the 1e-10 outer convergence contract
        while the bulk of the flops run at native TPU f32 speed."""
        z = self._vcycle(0, self._constrain(0, r.astype(self.dtype)))
        return z.astype(r.dtype)

    def with_fine_operator(self, op: Callable, lam_margin: float = 1.1):
        """Light clone sharing every level, with the FINE (level-0)
        operator replaced.

        Used by the nonlinear model to smooth the CURRENT Newton
        iteration's assembled tangent (the exact CG operator, already
        materialized for the matvec) instead of the constant small-strain
        proxy the hierarchy was built from — better spectrally AND cheaper
        per application when the assembled per-cell FMA matvec beats the
        Q_p structured proxy op. The fine diagonal and Chebyshev lam_max
        stay the proxy's (the tangent equals the proxy at F = I and stays
        spectrally close at moderate strains); `lam_margin` widens the
        smoothing interval to absorb tangent stiffening, since Chebyshev
        amplifies modes above the assumed lam_max.

        `op` may close over traced arrays (it is captured per CG solve at
        trace time); it must be masked like the proxy (identity on
        constrained DoFs) and accept/return the hierarchy dtype's shapes.
        """
        import copy

        clone = copy.copy(self)
        lv0 = self.levels[0]
        clone.levels = [
            dataclasses.replace(
                lv0, operator=op, lam_max=lv0.lam_max * lam_margin
            )
        ] + list(self.levels[1:])
        return clone
