"""Finite-strain compressible Neo-Hookean dynamics: Newmark-beta + Newton.

TPU-native re-design of `Nonlinear_Elasticity::Solid`
(`source/nonlinear_elasticity/nonlinear_elasticity.cc`). Per coupled time
step, a full Newton-Raphson iteration solves

    R(delta) = F_ext(u) + F_body - F_int(u) - M a(delta) = 0,   u = u_n + delta

with Newmark acceleration a = alpha_1 delta - alpha_2 v_n - alpha_3 a_n
(`nonlinear_elasticity.cc:592-599`) and the dual relative/absolute
convergence rule of `:459-463`. The consistent tangent action K v =
-dR/ddelta (material + geometric + mass, `:1000-1035`) is obtained
exactly by `jax.linearize` of the residual — no element tangent matrices
are ever formed. Each Newton step runs a matrix-free Jacobi-preconditioned
CG (or a dense direct solve for small validation problems).

The residual itself is three dense batched contractions over (cells,
q-points) — displacement-gradient evaluation, pointwise Kirchhoff stress,
and the test-function contraction — i.e. MXU matmuls plus fused VPU
elementwise math; the WorkStream/TBB scatter machinery of the reference
(`:1078-1084`) collapses into the transpose-gather reduction.

External interface tractions are pulled back to the reference configuration
with Nanson's formula n* = J F^{-T} N, ref stress = stress * ||n*||
(`:825-837`). Like the reference (which omits the Neumann term from the
assembled tangent), the pull-back factor is wrapped in stop_gradient so the
follower-load stiffness is excluded from Newton's tangent.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AllParameters
from ..fem.dofspace import DofSpace, build_transpose_gather_plan
from ..mesh.generator import StructuredMesh, make_scenario_grid
from ..ops.element_ops import (
    ElementMatrices,
    apply_plan,
    assemble_diagonal,
    body_force_vector,
    make_operator,
)
from ..solvers.cg import (
    cg_solve,
    chebyshev_preconditioner,
    estimate_lambda_max,
    jacobi_preconditioner,
)
from .material import NeoHookean, det_and_inv_c, kinematics_c


def internal_force_cellwise_T(ut, G, w, material):
    """Per-cell internal-force kernel in TPU layout: (dim, npc, c) nodal
    displacements -> ((dim, npc, c) per-cell residual contributions, min
    det F).

    The QP loop of `nonlinear_elasticity.cc:873-996` as dense batched
    contractions (MXU) + pointwise Kirchhoff stress (VPU). Tensor components
    (F, tau, ...) are held as separate (q, c) arrays with the huge cell axis
    trailing: TPU tiles the last two dims of every buffer to (sublane, 128),
    so a (c, q, dim, dim) layout would pad the (dim, dim) tail to (4, 128)
    and inflate the linearization residuals ~40x — fatal at 1M DoF. Shared
    by the single-device paths and the shard_map'd SPMD path."""
    dim, npc, c = ut.shape
    # grad_u[d][e]: (q, c) = G_e (q, npc) @ ut_d (npc, c)
    grad = [
        [
            jnp.dot(G[:, :, e], ut[d], preferred_element_type=ut.dtype)
            for e in range(dim)
        ]
        for d in range(dim)
    ]
    F, J, F_inv, b_bar = kinematics_c(grad)
    tau = material.tau_c(J, b_bar)
    # P[d][k] = (tau F^{-T})[d][k] = sum_e tau[d][e] F_inv[k][e]
    P = [
        [
            sum(tau[d][e] * F_inv[k][e] for e in range(dim))
            for k in range(dim)
        ]
        for d in range(dim)
    ]
    # rt[d]: (npc, c) = sum_k (w-weighted G_k)^T (npc, q) @ P[d][k] (q, c)
    GwT = [(G[:, :, k] * w[:, None]).T for k in range(dim)]
    rt = jnp.stack(
        [
            sum(
                jnp.dot(GwT[k], P[d][k], preferred_element_type=ut.dtype)
                for k in range(dim)
            )
            for d in range(dim)
        ],
        axis=0,
    )
    return rt, jnp.min(J)


def _extract_line_patches(line: jnp.ndarray, p: int, nc: int) -> jnp.ndarray:
    """(n_nodes_1d, dim) -> (dim, p+1, nc): 1D analog of
    extract_cell_patches_T for the 2D model's boundary edges."""
    dim = line.shape[-1]
    sls = [
        jax.lax.slice(line, (a, 0), (a + (nc - 1) * p + 1, dim), (p, 1))
        for a in range(p + 1)
    ]  # each (nc, dim)
    return jnp.stack(sls, axis=0).transpose(2, 0, 1)


def _overlap_add_line(
    rf: jnp.ndarray, p: int, nc: int, n_nodes: int
) -> jnp.ndarray:
    """(dim, p+1, nc) -> (n_nodes, dim): transpose of _extract_line_patches."""
    dim = rf.shape[0]
    out = jnp.zeros((n_nodes, dim), dtype=rf.dtype)
    for a in range(p + 1):
        out = out.at[a : a + (nc - 1) * p + 1 : p].add(rf[:, a, :].T)
    return out


class NonlinearState(NamedTuple):
    """Converged fields at t_n. The reference's six checkpoint vectors
    (`nonlinear_elasticity.cc:370-375`) reduce to three: after
    `update_old_variables` the *_old copies equal the current fields at
    every point where a coupling checkpoint can be taken."""

    displacement: jnp.ndarray  # total displacement u_n
    velocity: jnp.ndarray
    acceleration: jnp.ndarray


class NewtonInfo(NamedTuple):
    converged: jnp.ndarray  # bool
    iterations: jnp.ndarray  # Newton iterations taken
    residual_abs: jnp.ndarray
    residual_rel: jnp.ndarray
    update_abs: jnp.ndarray
    update_rel: jnp.ndarray
    cg_iterations: jnp.ndarray  # total CG iterations across Newton steps
    min_det_F: jnp.ndarray  # > 0 contract (`nonlinear_elasticity.cc:935`)
    # cost attribution (round-5): exactly how many residual evaluations
    # each precision paid (mixed schedule: calibration and stall-redo
    # evaluations included) and how many tangent assemblies ran
    # (modified Newton reuses; exact Newton assembles per solve). An f64
    # evaluation costs ~13x an f32 one on TPUs that emulate f64, so the
    # step-time model needs the true mix, not the assumed one.
    f64_evals: jnp.ndarray = 0
    f32_evals: jnp.ndarray = 0
    tangent_assemblies: jnp.ndarray = 0


class NonlinearElasticity:
    """Builds mesh/space/constants once; exposes jitted
    `step(state, interface_stress) -> (state, NewtonInfo)` and the pure
    residual for tests."""

    def __init__(
        self,
        params: AllParameters,
        mesh: Optional[StructuredMesh] = None,
        tags: Optional[dict] = None,
        refine: int = 0,
        quasi_static: bool = False,
        device_mesh=None,
        verbose: bool = False,
    ):
        self.verbose = verbose
        if not params.data_consistent:
            raise ValueError(
                "The neo-Hookean solid doesn't support 'Force' data reading. "
                "Please switch to 'Stress' data or use the linear model."
            )  # mirrors `nonlinear_elasticity.cc:83-88`
        self.params = params
        self.quasi_static = quasi_static
        dim = params.dim
        if mesh is None:
            mesh, tags = make_scenario_grid(
                params.scenario,
                dim,
                params.poly_degree,
                flap_location=params.flap_location,
                refine=refine,
                solver="neo-Hookean",
            )
        assert tags is not None
        self.mesh = mesh
        self.tags = tags
        self.interface_id = tags["interface"]
        from ..utils.phases import phase

        phase("nonlinear setup: mesh ready; building DoF space")
        # quadrature degree+2 per the reference (`nonlinear_elasticity.cc:74-75`)
        self.space = DofSpace.create(mesh, n_q_1d=params.poly_degree + 2)
        phase(f"nonlinear setup: DoF space ready ({self.space.n_dofs} DoF)")
        self.dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
        self.material = NeoHookean(params.mu, params.nu, params.rho)

        # Newmark coefficients (`nonlinear_elasticity.h:242-250`)
        dt, beta, gamma = params.delta_t, params.beta, params.gamma
        self.alpha_1 = 1.0 / (beta * dt * dt)
        self.alpha_2 = 1.0 / (beta * dt)
        self.alpha_3 = (1.0 - 2.0 * beta) / (2.0 * beta)
        self.alpha_4 = gamma / (beta * dt)
        self.alpha_5 = 1.0 - gamma / beta
        self.alpha_6 = (1.0 - gamma / (2.0 * beta)) * dt

        if device_mesh is None and params.n_devices > 1:
            from ..parallel.partition import make_device_mesh

            device_mesh = make_device_mesh(params.n_devices)
        self.device_mesh = device_mesh
        self._setup_device_constants()
        phase("nonlinear setup: done (step program compiles on first call)")
        self._step = jax.jit(self._make_step())

    # ------------------------------------------------------------------

    def _setup_device_constants(self):
        params = self.params
        space, tab = self.space, self.space.tab
        dim = space.dim
        h = np.asarray(self.mesh.cell_h)
        detJ = float(np.prod(h))
        dt = self.dtype

        sharded = self.device_mesh is not None
        # Two SPMD modes over a device mesh:
        #   * GSPMD lattice sharding (default, element_backend auto/
        #     structured): the structured gather-free operators are plain jax
        #     programs, so NamedSharding constraints on the nodal lattice
        #     partition them — XLA inserts halo exchanges (collective-
        #     permute) for the strided patch slices, the V-cycle transfers,
        #     and the Newton/CG vectors (proven bit-exact in
        #     tests/test_sharding.py). This is the production scaling path:
        #     it shards the MG preconditioner too.
        #   * shard_map cell partition (element_backend="gather"): explicit
        #     per-device cell blocks + psum nodal reduction; preconditioners
        #     run replicated.
        self._gspmd = sharded and params.element_backend in ("auto", "structured")
        use_shardmap = sharded and not self._gspmd
        self._structured = params.element_backend in ("auto", "structured")
        if self._gspmd:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = list(self.device_mesh.shape.keys())[0]
            self._shard_axis = axis
            self._node_sharding = NamedSharding(self.device_mesh, P(axis, None))

            def _shard(v):
                return jax.lax.with_sharding_constraint(v, self._node_sharding)

        else:
            self._shard_axis = None
            self._node_sharding = None

            def _shard(v):
                return v

        self._shard = _shard
        if use_shardmap:
            from ..parallel.partition import CellPartition
            from ..parallel.sharded_ops import (
                ShardedOperator,
                sharded_cellwise_reduction,
            )

            n_dev = self.device_mesh.devices.size
            self._part = CellPartition.create(space.cells, space.n_nodes, n_dev)
            self.cells = jnp.asarray(self._part.cells)  # (n_shards, cpd, npc)
            self.plan = None  # per-shard windowed plans live in _part
        else:
            self._part = None
            self.cells = jnp.asarray(space.cells)
            # the (n_nodes, valence) plan is only materialized on device for
            # the gather backend (structured mode never touches it)
            self.plan = None if self._structured else jnp.asarray(space.plan)
        # physical reference gradients and quadrature weights
        self.G = jnp.asarray(tab.dN / h[None, None, :], dtype=dt)  # (q,npc,dim)
        self.N = jnp.asarray(tab.N, dtype=dt)  # (q,npc)
        self.w = jnp.asarray(tab.q_weights * detJ, dtype=dt)  # (q,)

        # consistent mass (reference-configuration, constant) for the
        # inertia term; rho=0 or quasi_static disables it
        elem = ElementMatrices(space, 0.0, 0.0, params.rho)
        self._sumfact = None
        if use_shardmap:
            self.M = ShardedOperator(
                part=self._part,
                mesh=self.device_mesh,
                E=jnp.asarray(elem.M_e, dtype=dt),
                dim=dim,
            )

            def int_kernel(u, cells):
                cpd, npc = cells.shape
                ut = u[cells].transpose(2, 1, 0)  # (dim, npc, cpd)
                rt, mn = internal_force_cellwise_T(
                    ut, self.G, self.w, self.material
                )
                return rt.transpose(2, 1, 0).reshape(cpd * npc, dim), mn

            self._sharded_internal = sharded_cellwise_reduction(
                self._part, self.device_mesh, int_kernel, has_min=True
            )
        elif self._structured:
            from ..ops.structured import (
                _cells_shape,
                _grid_shape,
                make_structured_operator,
            )

            self._grid_shape = _grid_shape(space)
            self._reps_rev = _cells_shape(space)
            self._sharded_internal = None
            # sum-factorized f64 kernels (3D): the dense (q, npc)
            # tabulation matmuls are emulated-f64 compute-bound on TPU;
            # the per-axis 1D stage form cuts their multiplies ~13x
            if dim == 3 and params.use_sumfact:
                from ..ops.sumfact import (
                    make_sumfact_basis,
                    make_sumfact_mass_operator,
                )

                self._sumfact = make_sumfact_basis(tab, h, dt)
                self.M = make_sumfact_mass_operator(space, params.rho, dt)
            else:
                self.M = make_structured_operator(space, elem.M_e, dt)
        else:
            self.M = make_operator(space, elem.M_e, dt)
            self._sharded_internal = None

        bf = body_force_vector(space, elem, params.rho, params.body_force)
        self.body_force_enabled = bool(np.linalg.norm(params.body_force) > 1e-15)
        self._body_vec = jnp.asarray(bf, dtype=dt)

        # interface faces for the Neumann pull-back
        faces, fnodes = space.interface_faces(self.interface_id)
        lf = faces[:, 1]
        axes = lf // 2
        self.face_nodes = jnp.asarray(fnodes)  # (n_if, npf)
        # full volume connectivity of each interface-adjacent cell (small:
        # surface-only), used for the deformation gradient in the Nanson
        # pull-back regardless of how the volume cells are sharded
        self.face_cell_conn = jnp.asarray(space.cells[faces[:, 0]])
        face_G = tab.face_dN / h[None, None, None, :]  # (2dim, nqf, npc, dim)
        self.face_G = jnp.asarray(face_G[lf], dtype=dt)  # (n_if, nqf, npc, dim)
        self.face_normal = jnp.asarray(tab.face_normal_ref[lf], dtype=dt)
        # face basis restricted to face nodes (same tensor basis for every face)
        Nf = tab.face_N[0][:, tab.face_nodes[0]]
        self.face_Nf = jnp.asarray(Nf, dtype=dt)  # (nqf, npf)
        areaJ = detJ / h[axes]
        self.face_wJ = jnp.asarray(
            tab.face_q_weights[None, :] * areaJ[:, None], dtype=dt
        )  # (n_if, nqf)
        fplan, _ = build_transpose_gather_plan(fnodes, space.n_nodes)
        self.face_plan = jnp.asarray(fplan)
        # component-separated, faces-trailing copies for the hot Neumann
        # evaluation: rank-4 (n_if, nqf, dim, dim) f64 intermediates tile
        # their tiny (3, 3) tails to (8, 128) on TPU (~40x padding) and
        # measured 26.7 ms for 3.2k faces at 1M DoF; the (nqf, n_if)
        # component layout is sub-ms
        fG = np.transpose(face_G[lf], (3, 1, 2, 0))  # (dim, nqf, npc, n_if)
        self.face_G_T = jnp.asarray(fG, dtype=dt)
        self.face_normal_T = jnp.asarray(
            np.transpose(tab.face_normal_ref[lf]), dtype=dt
        )  # (dim, n_if)
        self.face_wJ_T = jnp.asarray(
            (tab.face_q_weights[None, :] * areaJ[:, None]).T, dtype=dt
        )  # (nqf, n_if)

        # Structured (gather-free) Neumann path: on the scenario meshes
        # every interface side covers a COMPLETE lattice side (verified
        # below), so the Nanson pull-back evaluates via strided boundary
        # slabs + shared face tabulations instead of per-face gathers.
        # Measured at 1M DoF: the gather formulation costs ~25 ms/eval
        # (TPU gathers + transpose-gather plan over all nodes); the slab
        # formulation is ~2 ms. Falls back to gathers for custom meshes.
        self._neumann_sides = None
        if self._structured:
            lf_np = np.asarray(faces[:, 1])
            sides = []
            complete = len(lf_np) > 0
            for f in sorted(set(lf_np.tolist())):
                axis, side01 = f // 2, f % 2
                n_side = int(
                    np.prod([r for a2, r in enumerate(self.mesh.reps) if a2 != axis])
                )
                if int((lf_np == f).sum()) != n_side:
                    complete = False
                    break
                Nf_f = tab.face_N[f][:, tab.face_nodes[f]]  # (nqf, npf)
                sides.append(
                    dict(
                        ga=dim - 1 - axis,  # grid axes are reversed
                        side=side01,
                        Gf=jnp.asarray(
                            tab.face_dN[f] / h[None, None, :], dtype=dt
                        ),
                        Nf=jnp.asarray(Nf_f, dtype=dt),
                        wf=jnp.asarray(
                            tab.face_q_weights * (detJ / h[axis]), dtype=dt
                        ),
                        normal=tuple(float(x) for x in tab.face_normal_ref[f]),
                    )
                )
            if complete:
                self._neumann_sides = sides

        # Dirichlet mask (`nonlinear_elasticity.cc:1094-1150`)
        self.mask = jnp.asarray(
            space.dirichlet_mask(self.tags["clamped"], self.tags.get("out_of_plane")),
            dtype=dt,
        )

        # Mixed-precision tangent: f32 copies of the operator constants for
        # the inner Krylov solve (inexact Newton — the f64 residual/norms
        # keep the reference's accuracy contract, the f32 linear solve runs
        # at native TPU speed instead of emulated-f64 speed)
        tdt = jnp.float32 if params.solve_dtype == "float32" else dt
        self.solve_dtype = tdt
        self._mixed_tangent = tdt != dt
        if self._mixed_tangent:
            G_t, w_t = self.G.astype(tdt), self.w.astype(tdt)
            mat = self.material
            self.mask_t = self.mask.astype(tdt)
            if use_shardmap:
                self.M_t = ShardedOperator(
                    part=self._part, mesh=self.device_mesh,
                    E=jnp.asarray(elem.M_e, dtype=tdt), dim=dim,
                )

                def int_kernel_t(u, cells):
                    cpd, npc = cells.shape
                    ut = u[cells].transpose(2, 1, 0)
                    rt, _ = internal_force_cellwise_T(ut, G_t, w_t, mat)
                    return rt.transpose(2, 1, 0).reshape(cpd * npc, dim)

                self._int_force_t = sharded_cellwise_reduction(
                    self._part, self.device_mesh, int_kernel_t
                )
            elif self._structured:
                from ..ops.structured import (
                    extract_cell_patches_T,
                    make_structured_operator,
                    overlap_add_T,
                )

                self.M_t = make_structured_operator(space, elem.M_e, tdt)
                p, gs, rr = space.mesh.degree, self._grid_shape, self._reps_rev

                def int_force_t(u):
                    ut = extract_cell_patches_T(u.reshape(gs + (dim,)), p, rr)
                    rt, _ = internal_force_cellwise_T(ut, G_t, w_t, mat)
                    return overlap_add_T(rt, p, rr, gs).reshape(-1, dim)

                self._int_force_t = int_force_t
                self._G_t, self._w_t = G_t, w_t

                def int_force_t_J(u):
                    ut = extract_cell_patches_T(u.reshape(gs + (dim,)), p, rr)
                    rt, mJ = internal_force_cellwise_T(ut, G_t, w_t, mat)
                    return overlap_add_T(rt, p, rr, gs).reshape(-1, dim), mJ

                self._int_force32_J = int_force_t_J
            else:
                self.M_t = make_operator(space, elem.M_e, tdt)
                cells_c, plan_c = self.cells, self.plan

                def int_force_t(u):
                    n_cells, npc = cells_c.shape
                    ut = u[cells_c].transpose(2, 1, 0)
                    rt, _ = internal_force_cellwise_T(ut, G_t, w_t, mat)
                    return apply_plan(
                        rt.transpose(2, 1, 0).reshape(n_cells * npc, dim),
                        plan_c,
                    )

                self._int_force_t = int_force_t

                def int_force_t_J(u):
                    n_cells, npc = cells_c.shape
                    ut = u[cells_c].transpose(2, 1, 0)
                    rt, mJ = internal_force_cellwise_T(ut, G_t, w_t, mat)
                    r = apply_plan(
                        rt.transpose(2, 1, 0).reshape(n_cells * npc, dim),
                        plan_c,
                    )
                    return r, mJ

                self._int_force32_J = int_force_t_J
        else:
            self.mask_t = self.mask
            self.M_t = None
            self._int_force_t = None
        if not hasattr(self, "_int_force32_J"):
            # shard_map cell-partition backend (or no mixed tangent): the
            # mixed residual schedule falls back to pure f64
            self._int_force32_J = None

        # Assembled-tangent backend selection (ops/assembled_tangent.py):
        # materialize per-cell element tangents once per Newton iteration
        # instead of re-linearizing the force per CG matvec — the
        # reference's assemble-once structure (`nonlinear_elasticity.cc:
        # 1044-1087`) in TPU form. Requires the structured (lattice) layout
        # for the patch extract/overlap-add and runs in the inner-solve
        # dtype; identical linearization, so Newton/CG behavior is
        # unchanged (tests/test_assembled_tangent.py).
        self._use_assembled = False
        self._tangent_mass = None
        self._tangent_pallas = False
        self._tangent_kernel = None
        if (
            params.tangent_backend in ("auto", "assembled")
            and params.type_lin == "CG"
            and self._mixed_tangent
            and self._structured
            and not use_shardmap
        ):
            from ..ops.assembled_tangent import tangent_bytes

            kb = tangent_bytes(space, self.solve_dtype)
            fits = kb <= params.assembled_tangent_max_gb * 1e9
            if not fits and params.tangent_backend == "assembled":
                raise ValueError(
                    f"tangent_backend='assembled' needs {kb/1e9:.1f} GB for "
                    f"the per-cell tangents (> assembled_tangent_max_gb="
                    f"{params.assembled_tangent_max_gb}); use 'jvp' or raise "
                    "the cap"
                )
            if fits:
                self._use_assembled = True
                if params.tangent_assembly_precision in (
                    "default", "bf16emu"
                ):
                    import warnings as _warnings

                    # round-4 hardware finding: 1-pass bf16 tangent
                    # assembly DIVERGES Newton on the production solve
                    # (max_u 4.5 vs 0.0107) — entry-wise rounding of K is
                    # amplified by kappa(K). Kept only for study;
                    # tests/test_assembled_tangent.py pins the failure
                    # class on CPU via 'bf16emu'.
                    _warnings.warn(
                        "tangent_assembly_precision="
                        f"'{params.tangent_assembly_precision}' assembles "
                        "the Newton tangent from single-bf16-pass matmuls "
                        "— measured DIVERGENT at production scale "
                        "(round-4 hardware session). Use 'highest' (or "
                        "'high') for real runs.",
                        stacklevel=2,
                    )
                npc = space.tab.n_nodes
                a1 = 0.0 if self.quasi_static else self.alpha_1
                m_scalar = np.asarray(elem.M_e).reshape(npc, dim, npc, dim)[
                    :, 0, :, 0
                ]
                self._tangent_mass = (
                    jnp.asarray(a1 * m_scalar, dtype=self.solve_dtype)
                    if a1 != 0.0
                    else None
                )
                # Pallas matvec: one VMEM-resident FMA sweep per K block —
                # pins the per-CG-iteration tangent apply at HBM bandwidth
                # (~1.3 ms/GB on v5e) where the XLA lowering of the same
                # contraction measures ~20 ms. Single-device TPU only
                # (the GSPMD path keeps the plain-jax form XLA can shard).
                self._tangent_pallas = False
                n_cells = int(np.prod(space.mesh.reps))
                if self.device_mesh is None:
                    from ..ops.assembled_tangent import (
                        _PALLAS_OK,
                        apply_packed_tangents_pallas,
                        apply_packed_tangents_sym_pallas,
                        upper_blocks,
                    )

                    try:
                        on_tpu = jax.default_backend() == "tpu"
                    except Exception:  # noqa: BLE001
                        on_tpu = False
                    if _PALLAS_OK and on_tpu:
                        bc = 512 if n_cells >= 512 else 128
                        edofs = npc * dim
                        sym = bool(params.tangent_block_symmetric)
                        # sidecar-cached probe outcome (keyed by the kernel
                        # source fingerprint): skips one standalone probe
                        # compile per fresh process. Ladder: the pack-free
                        # block-ref kernel first (no once-per-Newton pack
                        # pass over the ~1 GB tangent, no duplicate packed
                        # buffer), then the packed kernel, then XLA.
                        from ..ops import assembled_tangent as _at_mod
                        from ..utils import tunecache

                        fp = tunecache.source_fingerprint(_at_mod)
                        sdt_s = str(jnp.dtype(self.solve_dtype))
                        lay = "sym" if sym else "full"

                        def _probe_kernel(kind):
                            u0 = jnp.zeros(
                                (edofs, bc), dtype=self.solve_dtype
                            )
                            zb = jnp.zeros(
                                (npc, npc, bc), dtype=self.solve_dtype
                            )
                            if kind == "packedt":
                                z = jnp.zeros(
                                    (edofs, edofs, bc),
                                    dtype=self.solve_dtype,
                                )
                                out = (
                                    _at_mod.apply_packed_tangents_T_pallas(
                                        z, u0, bc
                                    )
                                )
                            elif kind == "blocks":
                                if sym:
                                    nb = len(upper_blocks(dim))
                                    out = _at_mod.apply_sym_block_tangents_pallas(
                                        [zb] * nb, u0, dim, npc, bc
                                    )
                                else:
                                    out = _at_mod.apply_block_tangents_pallas(
                                        [[zb] * dim for _ in range(dim)],
                                        u0, bc,
                                    )
                            elif sym:
                                nb = len(upper_blocks(dim))
                                z = jnp.zeros(
                                    (nb * npc, npc, bc),
                                    dtype=self.solve_dtype,
                                )
                                out = apply_packed_tangents_sym_pallas(
                                    z, u0, dim, npc, bc
                                )
                            else:
                                z = jnp.zeros(
                                    (edofs, edofs, bc),
                                    dtype=self.solve_dtype,
                                )
                                out = apply_packed_tangents_pallas(
                                    z, u0, bc
                                )
                            jax.block_until_ready(out)

                        self._tangent_kernel = None
                        kinds = {
                            # packedt first: the column-major pack's
                            # leading-axis slicing is the cheapest load
                            # pattern AND the only one the current remote
                            # Mosaic helper reliably compiles (the
                            # row-major kernels' middle-axis slices crash
                            # it — round-4 sessions)
                            "auto": ("packedt", "packed", "blocks"),
                            "blocks": ("blocks", "packed"),
                            "packed": ("packed",),
                            "packedt": ("packedt",),
                            "xla": (),
                        }[params.tangent_matvec_kernel]
                        if sym:
                            # no column-major variant of the sym kernels
                            if params.tangent_matvec_kernel == "packedt":
                                import warnings as _warnings

                                _warnings.warn(
                                    "tangent_matvec_kernel='packedt' has "
                                    "no block-symmetric variant; using "
                                    "'packed' (row-major) instead",
                                    stacklevel=2,
                                )
                                kinds = ("packed",)
                            else:
                                kinds = tuple(
                                    k for k in kinds if k != "packedt"
                                )
                        import os as _os

                        if _os.environ.get("BENCH_LAST_ATTEMPT") == "1":
                            # bench final retry: earlier attempts died in
                            # setup (wedged remote compile RPCs) — don't
                            # risk optional kernel probes again; XLA
                            # matvec is a safe, measured fallback
                            kinds = ()
                        elif kinds and not tunecache.pallas_healthy():
                            # Mosaic compiles are down for this process: a
                            # cached ok=True probe record must not put an
                            # uncompilable kernel inside the step program
                            kinds = ()
                        for kind in kinds:
                            pkey = tunecache.hardware_key(
                                "tangent_probe", kind, edofs, bc,
                                sdt_s, lay, fp,
                            )
                            rec = tunecache.load_probe("pallas_probe", pkey)
                            try:
                                if rec is None or not rec.get("ok"):
                                    if rec is not None and not rec.get("ok"):
                                        raise RuntimeError(
                                            "cached probe failure"
                                        )
                                    infl = tunecache.load(
                                        "pallas_probe_inflight", pkey
                                    )
                                    if infl and not infl.get("done"):
                                        # a previous process died INSIDE
                                        # this probe (wedged remote
                                        # compile RPC): skip the kind
                                        # rather than wedge again
                                        raise RuntimeError(
                                            "previous attempt wedged in "
                                            "this probe"
                                        )
                                    tunecache.store(
                                        "pallas_probe_inflight", pkey,
                                        dict(done=False),
                                    )
                                    tunecache.probe_with_retry(
                                        lambda: _probe_kernel(kind)
                                    )
                                    tunecache.store(
                                        "pallas_probe_inflight", pkey,
                                        dict(done=True),
                                    )
                                    tunecache.store(
                                        "pallas_probe", pkey, dict(ok=True)
                                    )
                                self._tangent_kernel = kind
                                break
                            except Exception as e:  # noqa: BLE001
                                import warnings

                                # the probe RETURNED (failed, not wedged):
                                # clear the in-flight breadcrumb so later
                                # processes may retry a transient failure
                                tunecache.store(
                                    "pallas_probe_inflight", pkey,
                                    dict(done=True),
                                )
                                warnings.warn(
                                    f"assembled-tangent Pallas {kind} "
                                    "matvec probe failed; trying the next "
                                    f"backend: {e!s:.200}",
                                    stacklevel=2,
                                )
                                if (
                                    rec is None
                                    and not tunecache.transient_failure(
                                        str(e)
                                    )
                                ):
                                    tunecache.store(
                                        "pallas_probe", pkey,
                                        dict(ok=False, error=str(e)[:200]),
                                    )
                        self._tangent_pallas = (
                            self._tangent_kernel is not None
                        )
                        if self._tangent_pallas:
                            self._tangent_block_c = bc
                            self._tangent_pad = (-n_cells) % bc
        elif params.tangent_backend == "assembled":
            raise ValueError(
                "tangent_backend='assembled' requires type_lin='CG', "
                "solve_dtype narrower than dtype (the mixed-precision inner "
                "solve) and the structured element backend"
            )

        # Jacobi preconditioner from the small-strain linearization at F = I:
        # c0 = lambda_eff IxI + 2 mu S with lambda_eff = kappa - 2 mu / dim,
        # plus the Newmark mass term alpha_1 M.
        from ..utils.phases import phase

        lam_eff = self.material.kappa - 2.0 * params.mu / dim
        elemK = ElementMatrices(space, lam_eff, params.mu, params.rho)
        a1 = 0.0 if self.quasi_static else self.alpha_1
        Ke_precond = elemK.K_e + a1 * elem.M_e
        phase("nonlinear setup: assembling Jacobi diagonal")
        diag_np = assemble_diagonal(space, Ke_precond)
        diag = self.mask * jnp.asarray(diag_np, dtype=dt) + (1.0 - self.mask)
        # preconditioners live in the dtype the Krylov solve runs in
        # (solve_dtype), unless precond_dtype narrows MG further
        sdt = tdt
        if params.preconditioner == "Chebyshev":
            # Chebyshev smooths on the *constant* small-strain proxy of the
            # tangent (exact tangent changes per Newton iteration; the proxy
            # shares its spectrum's shape at moderate strains)
            if use_shardmap:
                from ..parallel.sharded_ops import ShardedOperator as _ShOp

                proxy = _ShOp(
                    part=self._part, mesh=self.device_mesh,
                    E=jnp.asarray(Ke_precond, dtype=sdt), dim=dim,
                )
            elif self._structured:
                from ..ops.structured import make_structured_operator as _mks

                proxy = _mks(space, Ke_precond, sdt, precision="default")
            else:
                proxy = make_operator(space, Ke_precond, sdt)
            mask_s = self.mask.astype(sdt)
            diag_s = diag.astype(sdt)

            def proxy_bc_raw(v):
                return mask_s * proxy(mask_s * v) + (1.0 - mask_s) * v

            lam = float(
                estimate_lambda_max(proxy_bc_raw, diag_s, (space.n_nodes, dim))
            )

            def proxy_bc(v):
                return _shard(proxy_bc_raw(v))

            self._precond = chebyshev_preconditioner(
                proxy_bc, diag_s, lam,
                degree=params.cheb_degree, eig_ratio=params.cheb_eig_ratio,
            )
        elif params.preconditioner == "MG":
            if use_shardmap:
                raise NotImplementedError(
                    "MG with the shard_map cell-partition backend is not "
                    "supported; use element_backend='auto'/'structured' "
                    "(GSPMD lattice sharding) for the MG production config "
                    "on a device mesh"
                )
            from ..ops.pallas_phase import make_q2_operator_auto
            from ..solvers.multigrid import GeometricMultigrid

            pdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
                params.precond_dtype, sdt
            )
            # preconditioner-internal: fast default precision. On TPU the
            # degree-2 fine proxy uses the phase-split Pallas kernel (the
            # ~4 proxy applies per V-cycle are the dominant per-CG cost at
            # bench scale); single-device only — under GSPMD the XLA
            # formulation shards, a Pallas kernel would gather
            phase("nonlinear setup: building MG fine proxy operator")
            proxy = make_q2_operator_auto(
                space, Ke_precond, pdt, precision="default",
                use_pallas=params.use_pallas and self.device_mesh is None,
            )
            fmask = self.mask.astype(pdt)

            def proxy_bc(v):
                return fmask * proxy(fmask * v) + (1.0 - fmask) * v

            from ..utils import tunecache as _tcache

            phase("nonlinear setup: building MG hierarchy")
            self._precond = GeometricMultigrid(
                self.mesh, self.tags, proxy_bc, diag.astype(pdt), fmask,
                # host-side content identity of the BC-masked fine proxy
                # (element matrix + Dirichlet mask + hierarchy dtype) for
                # the sidecar-cached lam_max — never read back from device
                fine_fp=_tcache.array_fingerprint(Ke_precond)
                + _tcache.array_fingerprint(
                    space.dirichlet_mask(
                        self.tags["clamped"], self.tags.get("out_of_plane")
                    )
                )
                + str(jnp.dtype(pdt)),
                lmbda=lam_eff, mu=params.mu,
                mass_coeff=a1 * params.rho, dtype=pdt,
                smooth_degree=params.mg_smooth_degree,
                smooth_degree_fine=params.mg_fine_smooth_degree,
                coarse_size=params.mg_coarse_size,
                fem_sem=params.mg_fem_sem,
                use_pallas=params.use_pallas,
                skip_fine_smoothing=params.mg_skip_fine_smoothing,
                level_backend=params.mg_level_backend,
                device_mesh=self.device_mesh if self._gspmd else None,
                shard_axis=self._shard_axis or "shards",
            )
        elif params.preconditioner == "None":
            self._precond = None
        else:
            self._precond = jacobi_preconditioner(diag.astype(sdt))

        self._max_cg_iter = int(space.n_dofs * params.max_iterations_lin)
        # smooth the per-Newton-iteration assembled tangent on the MG fine
        # level instead of the constant small-strain proxy (see do_solve
        # and GeometricMultigrid.with_fine_operator)
        self._mg_fine_tangent = bool(
            params.mg_fine_tangent
            and params.preconditioner == "MG"
            and not params.mg_skip_fine_smoothing
        )

    # ------------------------------------------------------------------

    def _make_tangent_fns(self):
        """Closures `(assemble_Kt, make_tangent_matvec)` for the
        materialized per-cell tangent path (`self._use_assembled`).

        `assemble_Kt(u_t)` assembles AND packs the tangent at the f32
        iterate `u_t` into the pytree layout the selected matvec kernel
        consumes (a frozen/reused tangent therefore skips the pack pass
        too); `make_tangent_matvec(Kt)` returns the BC-masked CG operator
        over that pytree. Factored out of the Newton body so the
        modified-Newton reuse path can carry `Kt` across
        `lax.while_loop` iterations (`newton_tangent_reuse`)."""
        from ..ops.assembled_tangent import (
            apply_block_tangents_pallas,
            apply_cell_tangents,
            apply_cell_tangents_sym,
            apply_packed_tangents_pallas,
            apply_packed_tangents_sym_pallas,
            apply_packed_tangents_T_pallas,
            apply_sym_block_tangents_pallas,
            assemble_cell_tangents,
            assemble_cell_tangents_sym,
            pack_cell_tangents,
            pack_cell_tangents_T,
            pack_cell_tangents_sym,
        )
        from ..ops.structured import extract_cell_patches_T, overlap_add_T

        params = self.params
        dim = self.space.dim
        deg = self.mesh.degree
        gs, rr = self._grid_shape, self._reps_rev
        npc_l = self.space.tab.n_nodes
        bc = getattr(self, "_tangent_block_c", 0)
        pad = getattr(self, "_tangent_pad", 0)
        mask_t = self.mask_t
        sym = bool(params.tangent_block_symmetric)
        kern = self._tangent_kernel

        def assemble_Kt(u_t):
            ut_p = extract_cell_patches_T(u_t.reshape(gs + (dim,)), deg, rr)
            if self._tangent_pallas and pad:
                # pad the INPUT patches to the kernel's lane-block
                # multiple so the assembled tangent is born padded — a
                # ~25 MB copy here instead of a ~1 GB pad pass on the
                # materialized K (padded lanes see u=0 -> F=I, a benign
                # well-defined tangent)
                ut_p = jnp.pad(ut_p, ((0, 0), (0, 0), (0, pad)))
            if sym:
                # upper component blocks only: 2/3 the assembly matmuls
                # and matvec HBM traffic
                Ku = assemble_cell_tangents_sym(
                    ut_p, self._G_t, self._w_t, self.material,
                    mass_term=self._tangent_mass,
                    precision=params.tangent_assembly_precision,
                )
                if kern == "blocks" or not self._tangent_pallas:
                    return tuple(Ku)
                return pack_cell_tangents_sym(Ku)
            Kc = assemble_cell_tangents(
                ut_p, self._G_t, self._w_t, self.material,
                mass_term=self._tangent_mass,
                precision=params.tangent_assembly_precision,
            )
            if kern == "blocks" or not self._tangent_pallas:
                return tuple(tuple(row) for row in Kc)
            if kern == "packedt":
                return pack_cell_tangents_T(Kc)
            return pack_cell_tangents(Kc)

        def _pad_cols(pv):
            c = pv.shape[-1]
            p2 = pv.reshape(dim * npc_l, c)
            if pad:
                p2 = jnp.pad(p2, ((0, 0), (0, pad)))
            return p2, c

        def make_tangent_matvec(Kt):
            if sym:
                if kern == "blocks":

                    def _apply(pv):
                        p2, c = _pad_cols(pv)
                        o = apply_sym_block_tangents_pallas(
                            list(Kt), p2, dim, npc_l, bc
                        )[:, :c]
                        return o.reshape(dim, npc_l, c)

                elif self._tangent_pallas:

                    def _apply(pv):
                        p2, c = _pad_cols(pv)
                        o = apply_packed_tangents_sym_pallas(
                            Kt, p2, dim, npc_l, bc
                        )[:, :c]
                        return o.reshape(dim, npc_l, c)

                else:

                    def _apply(pv):
                        return apply_cell_tangents_sym(list(Kt), pv)

            elif kern == "blocks":

                def _apply(pv):
                    p2, c = _pad_cols(pv)
                    o = apply_block_tangents_pallas(
                        [list(r) for r in Kt], p2, bc
                    )[:, :c]
                    return o.reshape(dim, npc_l, c)

            elif kern == "packedt":

                def _apply(pv):
                    p2, c = _pad_cols(pv)
                    o = apply_packed_tangents_T_pallas(Kt, p2, bc)[:, :c]
                    return o.reshape(dim, npc_l, c)

            elif self._tangent_pallas:

                def _apply(pv):
                    p2, c = _pad_cols(pv)
                    o = apply_packed_tangents_pallas(Kt, p2, bc)[:, :c]
                    return o.reshape(dim, npc_l, c)

            else:

                def _apply(pv):
                    return apply_cell_tangents([list(r) for r in Kt], pv)

            def K32(v):
                mv = mask_t * v
                pv = extract_cell_patches_T(
                    mv.reshape(gs + (dim,)), deg, rr
                )
                Kv = overlap_add_T(_apply(pv), deg, rr, gs).reshape(-1, dim)
                return self._shard(mask_t * Kv + (1.0 - mask_t) * v)

            return K32

        return assemble_Kt, make_tangent_matvec

    # ------------------------------------------------------------------
    # pure physics functions (also used directly by tests)
    # ------------------------------------------------------------------

    def internal_force(self, u: jnp.ndarray) -> jnp.ndarray:
        """F_int[i] = int_Omega0 sym(grad_x N_i) : tau dV  — the geometric
        stress residual term of `nonlinear_elasticity.cc:980-996`.
        Also returns nothing else; min-J monitoring uses `min_det_F`."""
        r, _ = self._internal_force_and_J(u)
        return r

    def _internal_force_and_J(self, u: jnp.ndarray):
        if self._sharded_internal is not None:
            return self._sharded_internal(u)
        dim = u.shape[-1]
        if self._structured:
            from ..ops.structured import extract_cell_patches_T, overlap_add_T

            p = self.space.mesh.degree
            u_grid = u.reshape(self._grid_shape + (dim,))
            ut = extract_cell_patches_T(u_grid, p, self._reps_rev)
            if self._sumfact is not None:
                from ..ops.sumfact import internal_force_cellwise_sumfact

                rt, min_J = internal_force_cellwise_sumfact(
                    ut, self._sumfact, self.material
                )
            else:
                rt, min_J = internal_force_cellwise_T(
                    ut, self.G, self.w, self.material
                )
            r = overlap_add_T(rt, p, self._reps_rev, self._grid_shape)
            return r.reshape(-1, dim), min_J
        n_cells, npc = self.cells.shape
        ut = u[self.cells].transpose(2, 1, 0)
        rt, min_J = internal_force_cellwise_T(
            ut, self.G, self.w, self.material
        )
        rcell = rt.transpose(2, 1, 0)
        r = apply_plan(rcell.reshape(n_cells * npc, dim), self.plan)
        return r, min_J

    def external_force(self, u: jnp.ndarray, stress: jnp.ndarray) -> jnp.ndarray:
        """Nanson pull-back surface loading
        (`nonlinear_elasticity.cc:791-859`): the interface traction field
        (spatial) scaled by ||J F^{-T} N|| and integrated in the reference
        configuration. F is stop_gradient-ed: the reference's tangent omits
        the Neumann linearization. Dispatches to the strided-slab path when
        the interface decomposes into complete lattice sides."""
        if self._neumann_sides is not None:
            return self._external_force_structured(u, stress)
        return self._external_force_gather(u, stress)

    def _external_force_structured(
        self, u: jnp.ndarray, stress: jnp.ndarray
    ) -> jnp.ndarray:
        """Gather-free Nanson pull-back: per complete lattice side, the
        boundary cell slab is a strided slice, the face tabulation is shared
        by every face of the side (uniform cells), and the result
        overlap-adds onto the boundary plane — no TPU gathers anywhere."""
        from ..ops.structured import extract_cell_patches_T, overlap_add_T

        dim = u.shape[-1]
        p = self.space.mesh.degree
        gs, rr = self._grid_shape, self._reps_rev
        u_grid = u.reshape(gs + (dim,))
        s_grid = stress.reshape(gs + (dim,))
        out = jnp.zeros(gs + (dim,), dtype=u.dtype)
        for side in self._neumann_sides:
            ga, sd = side["ga"], side["side"]
            Gf, Nf, wf = side["Gf"], side["Nf"], side["wf"]
            normal = side["normal"]
            vol_sl = [slice(None)] * dim
            vol_sl[ga] = slice(0, p + 1) if sd == 0 else slice(-(p + 1), None)
            slab = u_grid[tuple(vol_sl)]
            slab_reps = list(rr)
            slab_reps[ga] = 1
            ut = jax.lax.stop_gradient(
                extract_cell_patches_T(slab, p, tuple(slab_reps))
            )  # (dim, npc, cs)
            grad = [
                [
                    jnp.dot(Gf[:, :, e], ut[d], preferred_element_type=u.dtype)
                    for e in range(dim)
                ]
                for d in range(dim)
            ]
            F = [
                [grad[i][j] + (1.0 if i == j else 0.0) for j in range(dim)]
                for i in range(dim)
            ]
            Jf, F_inv = det_and_inv_c(F)
            n_star = [
                Jf
                * sum(
                    F_inv[k][d] * normal[k]
                    for k in range(dim)
                    if normal[k] != 0.0
                )
                for d in range(dim)
            ]
            scale = jnp.sqrt(sum(n_star[d] ** 2 for d in range(dim)))

            pl_sl = list(vol_sl)
            pl_sl[ga] = 0 if sd == 0 else -1
            plane = s_grid[tuple(pl_sl)]  # plane axes + (dim,)
            plane_shape = tuple(n for a2, n in enumerate(gs) if a2 != ga)
            plane_reps = tuple(r for a2, r in enumerate(rr) if a2 != ga)
            if dim == 3:
                tn = extract_cell_patches_T(plane, p, plane_reps)
            else:
                tn = _extract_line_patches(plane, p, plane_reps[0])
            hi = jax.lax.Precision.HIGHEST
            wscale = wf[:, None] * scale
            rf = jnp.stack(
                [
                    jnp.dot(
                        Nf.T,
                        wscale * jnp.dot(Nf, tn[d], precision=hi),
                        precision=hi,
                    )
                    for d in range(dim)
                ],
                axis=0,
            )  # (dim, npf, cs)
            if dim == 3:
                contrib = overlap_add_T(rf, p, plane_reps, plane_shape)
            else:
                contrib = _overlap_add_line(rf, p, plane_reps[0], plane_shape[0])
            out = out.at[tuple(pl_sl)].add(contrib)
        return out.reshape(-1, dim)

    def _external_force_gather(
        self, u: jnp.ndarray, stress: jnp.ndarray
    ) -> jnp.ndarray:
        """Gather-based fallback (custom meshes / partial sides).

        Component-separated (nqf, n_if) layout throughout — see the
        face_G_T setup comment for why the tensor-shaped formulation is
        ~50x slower on TPU."""
        dim = u.shape[-1]
        conn = self.face_cell_conn  # (n_if, npc)
        # grad[d][e] (nqf, n_if) = sum_n face_G_T[e][q, n, f] * u_d[conn][f, n]
        uc = [
            jax.lax.stop_gradient(u[:, d][conn].T) for d in range(dim)
        ]  # (npc, n_if) each
        npc = conn.shape[1]
        grad = [
            [
                sum(
                    self.face_G_T[e, :, n, :] * uc[d][n][None, :]
                    for n in range(npc)
                )
                for e in range(dim)
            ]
            for d in range(dim)
        ]
        F = [
            [grad[i][j] + (1.0 if i == j else 0.0) for j in range(dim)]
            for i in range(dim)
        ]
        Jf, F_inv = det_and_inv_c(F)
        # n_star[d] = J * sum_k F_inv[k][d] * N_k  (J F^{-T} N)
        n_star = [
            Jf
            * sum(
                F_inv[k][d] * self.face_normal_T[k][None, :]
                for k in range(dim)
            )
            for d in range(dim)
        ]
        scale = jnp.sqrt(sum(n_star[d] ** 2 for d in range(dim)))  # (nqf, n_if)

        # traction at face QPs: t_q[d] (nqf, n_if) = face_Nf @ stress_d[fnodes]
        hi = jax.lax.Precision.HIGHEST
        tn = [stress[:, d][self.face_nodes].T for d in range(dim)]  # (npf, n_if)
        wscale = self.face_wJ_T * scale
        rf = [
            jnp.dot(
                self.face_Nf.T,
                wscale * jnp.dot(self.face_Nf, tn[d], precision=hi),
                precision=hi,
            )
            for d in range(dim)
        ]  # (npf, n_if) each
        n_if, npf = self.face_nodes.shape
        rcell = jnp.stack(rf, axis=-1).transpose(1, 0, 2)  # (n_if, npf, dim)
        return apply_plan(rcell.reshape(n_if * npf, dim), self.face_plan)

    def residual(
        self,
        delta: jnp.ndarray,
        state: NonlinearState,
        stress: jnp.ndarray,
    ):
        """The assembled system_rhs of the reference (masked): external +
        body - internal - inertia. Returns (rhs, min_J)."""
        u = state.displacement + delta
        r_int, min_J = self._internal_force_and_J(u)
        rhs = self.external_force(u, stress) - r_int
        if self.body_force_enabled:
            rhs = rhs + self._body_vec
        if not self.quasi_static:
            acc = (
                self.alpha_1 * delta
                - self.alpha_2 * state.velocity
                - self.alpha_3 * state.acceleration
            )
            rhs = rhs - self.M(acc)
        return self._shard(self.mask * rhs), min_J

    def _residual32(
        self,
        delta: jnp.ndarray,
        state: NonlinearState,
        stress: jnp.ndarray,
    ):
        """f32 evaluation of `residual` (same physics, same terms): used by
        the mixed Newton residual schedule for iterations whose accuracy
        target sits far above the f32 noise floor — the f64 evaluation is
        ~13x slower on TPUs that emulate f64 (measured 79 ms vs ~6 ms at
        1M DoF, v5e). Returns (rhs, min_J) cast back to the state dtype.
        The surface (external) term is O(N^(2/3)) work and stays f64."""
        tdt = self.solve_dtype
        u = state.displacement + delta
        r_int, min_J = self._int_force32_J(u.astype(tdt))
        rhs = self.external_force(u, stress).astype(tdt) - r_int
        if self.body_force_enabled:
            rhs = rhs + self._body_vec.astype(tdt)
        if not self.quasi_static:
            acc = (
                self.alpha_1 * delta
                - self.alpha_2 * state.velocity
                - self.alpha_3 * state.acceleration
            )
            rhs = rhs - self.M_t(acc.astype(tdt))
        rhs = (self.mask_t * rhs).astype(self.dtype)
        return self._shard(rhs), min_J.astype(self.dtype)

    # ------------------------------------------------------------------

    def initial_state(self) -> NonlinearState:
        z = jnp.zeros((self.space.n_nodes, self.space.dim), dtype=self.dtype)
        return NonlinearState(z, z, z)

    def _make_step(self):
        params = self.params
        mask = self.mask
        tol_u, tol_f = params.tol_u, params.tol_f
        max_nr = int(params.max_iterations_NR)
        use_cg = params.type_lin == "CG"
        precond = self._precond
        max_cg = self._max_cg_iter
        n_nodes, dim = self.space.n_nodes, self.space.dim
        if not use_cg and n_nodes * dim > 16384:
            raise ValueError(
                f"type_lin='Direct' materializes the dense "
                f"({n_nodes * dim}, {n_nodes * dim}) tangent at trace time; "
                f"capped at 16384 unknowns. Use type_lin='CG' for this size."
            )

        if self._use_assembled:
            assemble_Kt, make_tangent_matvec = self._make_tangent_fns()
        # Modified Newton: carry the assembled tangent across iterations
        # and refresh it only for the first `tangent_reuse_after`
        # iterations or on the stale-tangent safeguard (see config.py)
        reuse_tangent = bool(
            params.newton_tangent_reuse
            and self._use_assembled
            and use_cg
            and self._mixed_tangent
        )
        reuse_after = int(params.tangent_reuse_after)
        refresh_ratio = float(params.tangent_refresh_ratio)

        def norm(v):
            # Norms steer decisions only through *ratios* (res_rel, upd_rel,
            # Eisenstat-Walker eta) and threshold comparisons, so ~1e-7
            # relative accuracy suffices; an f32 reduction of the (exact,
            # f64) vector costs ~0.3 ms where the emulated-f64 vdot costs
            # ~8.7 ms at 1M DoF (measured, v5e). The vector itself stays
            # f64 — only the norm accumulation is narrowed.
            v32 = v.astype(jnp.float32).ravel()
            return jnp.sqrt(jnp.vdot(v32, v32)).astype(self.dtype)

        def newton_solve(state, stress):
            def rhs_fn(delta):
                r, _ = self.residual(delta, state, stress)
                return r

            zero = jnp.zeros((n_nodes, dim), dtype=self.dtype)

            class Carry(NamedTuple):
                delta: jnp.ndarray
                it: jnp.ndarray
                converged: jnp.ndarray
                res0: jnp.ndarray
                upd0: jnp.ndarray
                res_abs: jnp.ndarray
                res_rel: jnp.ndarray
                upd_abs: jnp.ndarray
                upd_rel: jnp.ndarray
                cg_total: jnp.ndarray
                min_J: jnp.ndarray
                res_floor: jnp.ndarray  # measured f32-residual noise floor
                calibrated: jnp.ndarray  # floor measured at a nonzero iterate
                want64_next: jnp.ndarray  # predicted: next iterate near floor
                Kt: tuple  # carried assembled tangent (modified Newton;
                #            () when tangent reuse is off)
                ratio_prev: jnp.ndarray  # previous iteration's residual
                #            contraction ratio (non-acceleration safeguard)
                n64: jnp.ndarray  # f64 residual evaluations paid
                n32: jnp.ndarray  # f32 residual evaluations paid
                nasm: jnp.ndarray  # tangent assemblies/linearizations paid

            one = jnp.asarray(1.0, self.dtype)

            # mixed residual schedule: f64 at iteration 0 (anchors res0 and
            # measures the f32 noise floor by evaluating BOTH precisions
            # once) and for iterations within 30x of that floor; f32 in
            # between. An f32 residual can never falsely satisfy the 1e-9
            # contract (its noise floor is additive), so correctness of the
            # reference's dual rel/abs rule is preserved — the final
            # iterations always evaluate in f64.
            f64_window = float(params.newton_residual_f64_window)
            mixed_resid = (
                use_cg
                and self._mixed_tangent
                and self._int_force32_J is not None
                and params.newton_residual == "mixed"
            )

            def cond(c: Carry):
                return jnp.logical_and(~c.converged, c.it < max_nr)

            def body(c: Carry):
                if mixed_resid:
                    false = jnp.asarray(False)

                    def e64(_):
                        rhs, mJ = self.residual(c.delta, state, stress)
                        return rhs, mJ, false

                    def e32(_):
                        rhs, mJ = self._residual32(c.delta, state, stress)
                        return rhs, mJ, jnp.asarray(True)

                    # f64 when: anchoring res0 (it 0), the floor is not yet
                    # calibrated, the current residual already sits near
                    # the floor, or last iteration PREDICTED this one would
                    # land there (quadratic convergence jumps past the
                    # floor in one step, so a current-residual rule alone
                    # evaluates the decisive iterate in f32 and wastes a
                    # Newton step)
                    want64 = jnp.logical_or(
                        jnp.logical_or(
                            jnp.logical_or(c.it == 0, ~c.calibrated),
                            c.res_rel <= f64_window * c.res_floor,
                        ),
                        c.want64_next,
                    )
                    rhs, min_J, was32 = jax.lax.cond(want64, e64, e32, None)
                    res_abs0 = norm(rhs)

                    # Floor calibration: one extra f32 evaluation (~1/13
                    # the f64 cost) alongside an f64 one measures the noise
                    # floor up front, so near-floor iterations hand back to
                    # f64 directly instead of running stall-detected f32
                    # iterations first (measured +2 Newton its at scale 3
                    # without this). Only a NONZERO iterate gives a
                    # representative floor — at the very first step u = 0
                    # makes both precisions exact (floor 0), which made
                    # step 0 pay +2 stall-detected iterations when it was
                    # calibrated there; ~calibrated keeps evaluations f64
                    # until the first nonzero iterate (step 0: iteration 1).
                    u_nonzero = norm(state.displacement + c.delta) > 0.0

                    # the floor is compared against res_rel = res_abs/res0,
                    # so it must be noise/res0: at iteration 0 res0 is about
                    # to be anchored to THIS residual's norm, afterwards
                    # (step-0 calibrates at iteration 1) it is c.res0
                    _floor_denom = jnp.where(c.it == 0, res_abs0, c.res0)

                    def calib(_):
                        rhs32, _ = self._residual32(c.delta, state, stress)
                        return norm(rhs32 - rhs) / jnp.maximum(
                            _floor_denom, 1e-300
                        )

                    def nocalib(_):
                        return c.res_floor

                    can_calib = jnp.logical_and(
                        jnp.logical_and(~was32, ~c.calibrated), u_nonzero
                    )
                    floor0 = jax.lax.cond(can_calib, calib, nocalib, None)
                    calibrated = jnp.logical_or(c.calibrated, can_calib)

                    # stall detection: an f32 iteration that fails to cut
                    # the residual in half has hit (or approached) the f32
                    # noise floor — re-evaluate THIS iterate in f64 and
                    # re-calibrate the floor from the difference. Written
                    # NaN-safe (~(x <= y) instead of x > y): an f32
                    # residual that overflows/NaNs at a large iterate
                    # must hand back to f64 rather than feed NaN to the
                    # whole Newton carry (round-5: a diverging-load test
                    # showed 12 straight f32 evals riding a NaN residual
                    # because NaN > x is False)
                    stall = jnp.logical_and(
                        was32, ~(res_abs0 <= 0.5 * c.res_abs)
                    )

                    def redo(_):
                        rhs64, mJ64 = self.residual(c.delta, state, stress)
                        fl = norm(rhs64 - rhs) / jnp.maximum(
                            c.res0, 1e-300
                        )
                        return rhs64, mJ64, jnp.maximum(fl, floor0)

                    def keep(_):
                        return rhs, min_J, floor0

                    rhs, min_J, res_floor = jax.lax.cond(
                        stall, redo, keep, None
                    )
                    calibrated = jnp.logical_or(calibrated, stall)
                    # eval accounting: e64/e32 pick one evaluation; the
                    # floor calibration adds an f32; a stall-redo adds an
                    # f64 on top of the f32 already paid
                    n64_inc = jnp.where(was32, 0, 1) + jnp.where(
                        stall, 1, 0
                    )
                    n32_inc = jnp.where(was32, 1, 0) + jnp.where(
                        can_calib, 1, 0
                    )
                else:
                    rhs, min_J = self.residual(c.delta, state, stress)
                    res_floor = c.res_floor
                    calibrated = c.calibrated
                    n64_inc = jnp.int32(1)
                    n32_inc = jnp.int32(0)
                res_abs = norm(rhs)
                res0 = jnp.where(c.it == 0, jnp.maximum(res_abs, 1e-300), c.res0)
                res_rel = res_abs / res0
                if mixed_resid:
                    # predict the NEXT iterate's residual from the forcing
                    # term (mirrors cg_tolerance below): if it lands within
                    # the f64 window of the noise floor, evaluate it in f64
                    if params.newton_forcing == "ew":
                        _ratio = res_abs / c.res_abs
                        _eta = jnp.where(
                            c.it == 0,
                            jnp.asarray(params.ew_eta0, self.dtype),
                            jnp.clip(0.9 * _ratio * _ratio, 1e-4, 0.5),
                        )
                        _T = jnp.maximum(tol_f * res0, 5e-9)
                        _pred = jnp.maximum(_eta * res_abs, 0.5 * _T)
                    else:
                        _pred = params.tol_lin * res_abs
                    want64_next = _pred / res0 <= f64_window * res_floor
                else:
                    want64_next = c.want64_next
                if self.verbose:
                    # the reference's per-iteration convergence table
                    # (`nonlinear_elasticity.cc:503-542`); host callback, so
                    # only for interactive/debug runs
                    jax.debug.print(
                        "    NR it {it}: RES_F(abs) {ra:.4e}  RES_F(rel) "
                        "{rr:.4e}  NU(rel) {ur:.4e}  min J {mj:.4f}",
                        it=c.it, ra=res_abs, rr=res_rel,
                        ur=c.upd_rel, mj=min_J,
                    )
                # dual rel/abs rule of `nonlinear_elasticity.cc:459-463`
                conv = jnp.logical_and(
                    c.it > 0,
                    jnp.logical_and(
                        jnp.logical_or(c.upd_rel <= tol_u, c.upd_abs <= 1e-15),
                        jnp.logical_or(res_rel <= tol_f, res_abs <= 5e-9),
                    ),
                )

                def cg_tolerance():
                    """Absolute CG tolerance for this Newton iteration."""
                    if params.newton_forcing == "ew":
                        # Eisenstat-Walker choice 2 (gamma=0.9, alpha=2):
                        # eta_k = 0.9 (||R_k||/||R_{k-1}||)^2, clipped; the
                        # 0.5*T floor stops over-solving once the linear
                        # residual is already below half the Newton target
                        ratio = res_abs / c.res_abs
                        eta = jnp.where(
                            c.it == 0,
                            jnp.asarray(params.ew_eta0, self.dtype),
                            jnp.clip(0.9 * ratio * ratio, 1e-4, 0.5),
                        )
                        T = jnp.maximum(tol_f * res0, 5e-9)
                        return jnp.maximum(eta * res_abs, 0.5 * T)
                    return params.tol_lin * res_abs  # `:1171-1172`

                def do_solve(Kt_in):
                    if use_cg and self._mixed_tangent:
                        # inexact Newton: tangent action linearized from the
                        # f32 copy of the internal force at the current
                        # iterate; external/body terms have zero derivative
                        # (stop_gradient pull-back, constant body force) and
                        # the mass term is linear, so this is the complete
                        # consistent tangent — just computed in f32
                        tdtype = self.solve_dtype
                        u_t = (state.displacement + c.delta).astype(tdtype)
                        mask_t = self.mask_t
                        a1_t = 0.0 if self.quasi_static else self.alpha_1

                        if self._use_assembled:
                            # materialize per-cell tangents (once per
                            # refresh), then each CG matvec is extract ->
                            # batched FMA sweep -> overlap-add (one linear
                            # HBM pass over K) — see _make_tangent_fns
                            if reuse_tangent:
                                # modified Newton: refresh for the first
                                # `tangent_reuse_after` iterations, then
                                # freeze. Non-acceleration safeguard:
                                # exact Newton's ratios shrink iteration
                                # over iteration; a stale frozen tangent
                                # contracts at a CONSTANT rate — so a
                                # frozen iteration whose ratio fails to
                                # drop below half the previous ratio
                                # re-assembles at the current iterate,
                                # unless the frozen rate is already
                                # faster than refresh_ratio (fast enough
                                # that a refresh costs more than the 1-2
                                # remaining iterations it would save)
                                ratio = res_abs / c.res_abs
                                stale = jnp.logical_and(
                                    ratio > 0.5 * c.ratio_prev,
                                    ratio > refresh_ratio,
                                )
                                refresh = jnp.logical_or(
                                    c.it < reuse_after,
                                    jnp.logical_and(
                                        c.it > reuse_after, stale
                                    ),
                                )
                                Kt = jax.lax.cond(
                                    refresh,
                                    lambda _: assemble_Kt(u_t),
                                    lambda _: Kt_in,
                                    None,
                                )
                                K32 = make_tangent_matvec(Kt)
                                asm_inc = jnp.where(refresh, 1, 0).astype(
                                    jnp.int32
                                )
                            else:
                                # fresh tangent every iteration: keep it
                                # local (the carry slot stays the empty
                                # pytree no_solve threads through)
                                K32 = make_tangent_matvec(
                                    assemble_Kt(u_t)
                                )
                                Kt = Kt_in
                                asm_inc = jnp.int32(1)

                        else:
                            Kt = Kt_in
                            asm_inc = jnp.int32(1)
                            _, jvp_int = jax.linearize(self._int_force_t, u_t)

                            def K32(v):
                                mv = mask_t * v
                                Kv = jvp_int(mv)
                                if not self.quasi_static:
                                    Kv = Kv + a1_t * self.M_t(mv)
                                return self._shard(
                                    mask_t * Kv + (1.0 - mask_t) * v
                                )

                        tol = cg_tolerance().astype(tdtype)
                        precond_k = precond
                        if self._mg_fine_tangent and self._use_assembled:
                            # smooth THIS iteration's assembled tangent (the
                            # exact CG operator, already materialized) on
                            # the V-cycle's fine level instead of the
                            # constant small-strain proxy: spectrally exact
                            # and one batched FMA sweep per apply where the
                            # proxy pays a Q_p structured matvec
                            pdt = precond.dtype

                            def fine_tangent_op(v):
                                return K32(v.astype(tdtype)).astype(pdt)

                            precond_k = precond.with_fine_operator(
                                fine_tangent_op
                            )
                        r = cg_solve(
                            K32, rhs.astype(tdtype),
                            jnp.zeros((n_nodes, dim), dtype=tdtype),
                            tol=tol, max_iter=max_cg, preconditioner=precond_k,
                        )
                        return (
                            r.x.astype(self.dtype), r.iterations, Kt, asm_inc
                        )

                    # consistent tangent action via linearization at delta
                    _, jvp = jax.linearize(rhs_fn, c.delta)

                    def K(v):
                        return self._shard(mask * (-jvp(mask * v)) + (1.0 - mask) * v)

                    if use_cg:
                        r = cg_solve(K, rhs, zero, tol=cg_tolerance(),
                                     max_iter=max_cg, preconditioner=precond)
                        return r.x, r.iterations, Kt_in, jnp.int32(1)
                    # dense direct: materialize the tangent (small cases only)
                    basis = jnp.eye(n_nodes * dim, dtype=self.dtype)
                    cols = jax.vmap(
                        lambda e: K(e.reshape(n_nodes, dim)).reshape(-1),
                        out_axes=1,
                    )(basis)
                    du = jnp.linalg.solve(cols, rhs.reshape(-1))
                    return (
                        du.reshape(n_nodes, dim), jnp.int32(1), Kt_in,
                        jnp.int32(1),
                    )

                def no_solve(Kt_in):
                    return zero, jnp.int32(0), Kt_in, jnp.int32(0)

                du, cg_its, Kt_new, asm_new = jax.lax.cond(
                    conv, no_solve, do_solve, c.Kt
                )
                upd_abs_new = norm(mask * du)
                upd0 = jnp.where(
                    jnp.logical_and(c.it == 0, ~conv),
                    jnp.maximum(upd_abs_new, 1e-300),
                    c.upd0,
                )
                upd_abs = jnp.where(conv, c.upd_abs, upd_abs_new)
                upd_rel = jnp.where(conv, c.upd_rel, upd_abs_new / upd0)
                return Carry(
                    delta=c.delta + du,
                    it=jnp.where(conv, c.it, c.it + 1),
                    converged=conv,
                    res0=res0,
                    upd0=upd0,
                    res_abs=res_abs,
                    res_rel=res_rel,
                    upd_abs=upd_abs,
                    upd_rel=upd_rel,
                    cg_total=c.cg_total + cg_its,
                    min_J=jnp.minimum(c.min_J, min_J),
                    res_floor=res_floor,
                    calibrated=calibrated,
                    want64_next=want64_next,
                    Kt=Kt_new,
                    ratio_prev=jnp.where(
                        conv, c.ratio_prev, res_abs / c.res_abs
                    ),
                    n64=c.n64 + n64_inc,
                    n32=c.n32 + n32_inc,
                    nasm=c.nasm + asm_new,
                )

            if params.newton_predictor and not self.quasi_static:
                # constant-acceleration Newmark predictor (the reference
                # zeroes solution_delta every step,
                # `nonlinear_elasticity.cc:136-137`)
                delta0 = params.delta_t * state.velocity + (
                    0.5 * params.delta_t**2
                ) * state.acceleration
                delta0 = mask * delta0
            else:
                delta0 = zero
            if reuse_tangent:
                # zero-initialized carry slot for the assembled tangent;
                # iteration 0 always refreshes (it < reuse_after), so the
                # zeros are never applied — they only fix the carry's
                # pytree structure/shapes
                Kt0 = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype),
                    jax.eval_shape(
                        assemble_Kt,
                        jax.ShapeDtypeStruct(
                            (n_nodes, dim), self.solve_dtype
                        ),
                    ),
                )
            else:
                Kt0 = ()
            init = Carry(
                delta=delta0,
                it=jnp.int32(0),
                converged=jnp.asarray(False),
                res0=one,
                upd0=one,
                res_abs=one,
                res_rel=one,
                upd_abs=one,
                upd_rel=one,
                cg_total=jnp.int32(0),
                min_J=jnp.asarray(jnp.inf, self.dtype),
                res_floor=jnp.asarray(0.0, self.dtype),
                calibrated=jnp.asarray(False),
                want64_next=jnp.asarray(False),
                Kt=Kt0,
                ratio_prev=one,
                n64=jnp.int32(0),
                n32=jnp.int32(0),
                nasm=jnp.int32(0),
            )
            return jax.lax.while_loop(cond, body, init)

        def step(state: NonlinearState, stress: jnp.ndarray):
            c = newton_solve(state, stress)
            delta = c.delta
            # Newmark updates (`nonlinear_elasticity.cc:592-610`)
            acc_new = (
                self.alpha_1 * delta
                - self.alpha_2 * state.velocity
                - self.alpha_3 * state.acceleration
            )
            vel_new = (
                self.alpha_4 * delta
                + self.alpha_5 * state.velocity
                + self.alpha_6 * state.acceleration
            )
            new_state = NonlinearState(
                displacement=state.displacement + delta,
                velocity=vel_new,
                acceleration=acc_new,
            )
            info = NewtonInfo(
                converged=c.converged,
                iterations=c.it,
                residual_abs=c.res_abs,
                residual_rel=c.res_rel,
                update_abs=c.upd_abs,
                update_rel=c.upd_rel,
                cg_iterations=c.cg_total,
                min_det_F=c.min_J,
                f64_evals=c.n64,
                f32_evals=c.n32,
                tangent_assemblies=c.nasm,
            )
            return new_state, info

        return step

    def step(
        self, state: NonlinearState, interface_stress: jnp.ndarray
    ) -> Tuple[NonlinearState, NewtonInfo]:
        """One Newmark time step: full Newton solve + velocity/acceleration
        updates, fully jitted. Raises on non-convergence is the caller's
        responsibility (check `info.converged`, mirroring the AssertThrow at
        `nonlinear_elasticity.cc:497-498`)."""
        return self._step(state, interface_stress)

    def jittable_step(self):
        """The pure (un-jitted) step function `(state, stress) -> (state,
        info)` — the public surface for wrapping in jax transforms (jit,
        sharding constraints, scan over windows)."""
        return self._make_step()

    def with_delta_t(self, delta_t: float) -> "NonlinearElasticity":
        """A solver clone stepping with a different dt on the same mesh,
        memoized per dt. Supports subcycling: a coupling window that is not
        an integer multiple of delta_t is closed with a shortened cached
        stepper (the `Time::set_absolute_time` design headroom,
        `adapter.h:104-107`, `time_handler.h:63-70`). The Newmark
        alpha-coefficients, tangent operators and preconditioner hierarchy
        all depend on dt, so the clone rebuilds them once and reuses its
        compiled step thereafter."""
        import dataclasses as _dc

        if float(delta_t) == float(self.params.delta_t):
            return self
        cache = self.__dict__.setdefault("_dt_clones", {})
        key = float(delta_t)
        if key not in cache:
            cache[key] = type(self)(
                _dc.replace(self.params, delta_t=key),
                mesh=self.mesh,
                tags=self.tags,
                quasi_static=self.quasi_static,
                device_mesh=self.device_mesh,
                verbose=self.verbose,
            )
        return cache[key]
