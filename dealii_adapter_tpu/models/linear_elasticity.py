"""Dynamic linear elasticity with one-step theta time integration.

TPU-native re-design of the reference's `Linear_Elasticity::ElastoDynamics`
(`source/linear_elasticity/linear_elasticity.cc`): the unknown of each step
is the velocity V_{n+1}, solved from

    (M + theta^2 dt^2 K) V_{n+1} =  dt theta F_{n+1} + dt (1-theta) F_n
                                  + (M - theta(1-theta) dt^2 K) V_n
                                  - dt K D_n                          (rhs at :398-420)

followed by D_{n+1} = D_n + dt theta V_{n+1} + dt (1-theta) V_n (:583-585).
F is the coupling load: consistent face-traction integration of the nodal
interface stress field (:457-521) or the raw nodal force vector
("conservative", :388), plus constant body forces (:357-373).

Everything per step is one jitted pure function over a `LinearState`
pytree: two constant-element-matrix matvecs (MXU matmuls) for the RHS and a
matrix-free preconditioned CG (or prefactored dense Cholesky) for the solve.
The stepping operator is constant, so its element matrix M_e + (theta dt)^2
K_e is formed once (`linear_elasticity.cc:348-353`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AllParameters
from ..fem.dofspace import DofSpace
from ..mesh.generator import StructuredMesh, make_scenario_grid
from ..ops.element_ops import (
    ElementMatrices,
    assemble_dense,
    assemble_diagonal,
    body_force_vector,
    make_face_loading,
    make_operator,
)
from ..solvers.cg import (
    cg_solve,
    chebyshev_preconditioner,
    estimate_lambda_max,
    ir_cg_solve,
    jacobi_preconditioner,
)
from ..solvers.direct import DenseCholesky


class LinearState(NamedTuple):
    """Time-dependent state (n_nodes, dim) fields. `old_load` is the
    assembled coupling load F_n of the previous step (the reference's
    `old_stress` vector after `assemble_rhs`, `linear_elasticity.cc:405-409`)."""

    displacement: jnp.ndarray
    velocity: jnp.ndarray
    old_load: jnp.ndarray


class StepInfo(NamedTuple):
    iterations: jnp.ndarray
    residual: jnp.ndarray
    linf_velocity: jnp.ndarray


class LinearElastodynamics:
    """Solver object: builds mesh/space/operators once; exposes a jitted
    `step(state, interface_data) -> (state, info)`."""

    def __init__(
        self,
        params: AllParameters,
        mesh: Optional[StructuredMesh] = None,
        tags: Optional[dict] = None,
        refine: int = 0,
        device_mesh=None,
    ):
        self.params = params
        dim = params.dim
        if mesh is None:
            mesh, tags = make_scenario_grid(
                params.scenario,
                dim,
                params.poly_degree,
                flap_location=params.flap_location,
                refine=refine,
                solver="linear",
            )
        assert tags is not None
        self.mesh = mesh
        self.tags = tags
        self.interface_id = tags["interface"]
        self.space = DofSpace.create(mesh, n_q_1d=params.poly_degree + 1)
        self.dtype = jnp.float64 if params.dtype == "float64" else jnp.float32

        elem = ElementMatrices(self.space, params.lmbda, params.mu, params.rho)
        self.elem = elem
        dt, theta = params.delta_t, params.theta
        A_e = elem.M_e + (theta * dt) ** 2 * elem.K_e

        if device_mesh is None and params.n_devices > 1:
            from ..parallel.partition import make_device_mesh as _mkmesh

            device_mesh = _mkmesh(params.n_devices)
        self.device_mesh = device_mesh
        # mixed-precision linear solves: the stepping-operator CG runs in
        # f32 inside an f64 iterative-refinement loop (solvers/cg.py
        # ir_cg_solve) so the reference's absolute 1e-10 tolerance is met in
        # f64 while the Krylov flops run at native TPU f32 speed
        sdt = jnp.float32 if params.solve_dtype == "float32" else self.dtype
        self.solve_dtype = sdt
        self._mixed = sdt != self.dtype

        # SPMD modes (see NonlinearElasticity._setup_device_constants):
        # GSPMD lattice sharding (element_backend auto/structured) shards the
        # structured operators + MG via NamedSharding constraints; the
        # shard_map cell partition stays behind element_backend="gather".
        self._gspmd = device_mesh is not None and params.element_backend in (
            "auto", "structured",
        )
        use_shardmap = device_mesh is not None and not self._gspmd
        if self._gspmd:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._shard_axis = list(device_mesh.shape.keys())[0]
            self._node_sharding = NamedSharding(
                device_mesh, P(self._shard_axis, None)
            )

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
            from ..parallel.sharded_ops import ShardedOperator

            part = CellPartition.create(
                self.space.cells, self.space.n_nodes, device_mesh.devices.size
            )
            self._part = part

            def mkop(E, dtype=self.dtype):
                return ShardedOperator(
                    part=part,
                    mesh=device_mesh,
                    E=jnp.asarray(E, dtype=dtype),
                    dim=self.space.dim,
                )

            self.K, self.M, self.A = mkop(elem.K_e), mkop(elem.M_e), mkop(A_e)
            self.A_lo = mkop(A_e, sdt) if self._mixed else self.A
        else:
            self._part = None
            backend = params.element_backend
            if backend == "auto":
                backend = "structured"
            if backend == "structured":
                from ..ops.structured import make_structured_operator as _mk
            else:
                _mk = make_operator
            self.K = _mk(self.space, elem.K_e, self.dtype)
            self.M = _mk(self.space, elem.M_e, self.dtype)
            self.A = _mk(self.space, A_e, self.dtype)
            self.A_lo = _mk(self.space, A_e, sdt) if self._mixed else self.A

        self.mask = jnp.asarray(
            self.space.dirichlet_mask(tags["clamped"], tags.get("out_of_plane")),
            dtype=self.dtype,
        )
        self.mask_lo = self.mask.astype(sdt)
        # Jacobi diagonal of the BC-masked stepping matrix (1 on constrained)
        diag_np = assemble_diagonal(self.space, A_e)
        diag = self.mask * jnp.asarray(diag_np, dtype=self.dtype) + (1.0 - self.mask)
        # preconditioners live in the dtype the Krylov solve runs in
        if params.preconditioner == "Chebyshev":
            mask_s, diag_s = self.mask_lo, diag.astype(sdt)
            A_lo = self.A_lo

            def A_lo_cheb(v):
                return mask_s * A_lo(mask_s * v) + (1.0 - mask_s) * v

            lam = float(
                estimate_lambda_max(A_lo_cheb, diag_s, (self.space.n_nodes, dim))
            )

            def A_lo_cheb_sh(v):
                return _shard(A_lo_cheb(v))

            self._precond = chebyshev_preconditioner(
                A_lo_cheb_sh, diag_s, lam,
                degree=params.cheb_degree, eig_ratio=params.cheb_eig_ratio,
            )
        elif params.preconditioner == "MG":
            if use_shardmap:
                raise NotImplementedError(
                    "MG with the shard_map cell-partition backend is not "
                    "supported; use element_backend='auto'/'structured' "
                    "(GSPMD lattice sharding) for MG on a device mesh"
                )
            from ..ops.pallas_phase import make_q2_operator_auto
            from ..solvers.multigrid import GeometricMultigrid

            c = (theta * dt) ** 2
            pdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
                params.precond_dtype, sdt
            )
            # preconditioner-internal: fast default precision; degree-2
            # fine proxy uses the phase-split Pallas kernel on TPU
            # (single-device — see nonlinear model note)
            A_p = make_q2_operator_auto(
                self.space, A_e, pdt, precision="default",
                use_pallas=params.use_pallas and device_mesh is None,
            )
            fmask = self.mask.astype(pdt)

            def fine_op(v):
                return fmask * A_p(fmask * v) + (1.0 - fmask) * v

            from ..utils import tunecache as _tcache

            self._precond = GeometricMultigrid(
                self.mesh, tags,
                fine_op, diag.astype(pdt), fmask,
                # host-side content identity for the sidecar-cached fine
                # lam_max (see nonlinear model note)
                fine_fp=_tcache.array_fingerprint(A_e)
                + _tcache.array_fingerprint(
                    self.space.dirichlet_mask(
                        tags["clamped"], tags.get("out_of_plane")
                    )
                )
                + str(jnp.dtype(pdt)),
                lmbda=c * params.lmbda, mu=c * params.mu,
                mass_coeff=params.rho, dtype=pdt,
                smooth_degree=params.mg_smooth_degree,
                smooth_degree_fine=params.mg_fine_smooth_degree,
                coarse_size=params.mg_coarse_size,
                fem_sem=params.mg_fem_sem,
                use_pallas=params.use_pallas,
                skip_fine_smoothing=params.mg_skip_fine_smoothing,
                level_backend=params.mg_level_backend,
                device_mesh=device_mesh if self._gspmd else None,
                shard_axis=self._shard_axis or "shards",
            )
        elif params.preconditioner == "None":
            self._precond = None
        else:
            self._precond = jacobi_preconditioner(diag.astype(sdt))

        self.face_load = make_face_loading(
            self.space, elem, self.interface_id, self.dtype
        )
        bf = body_force_vector(self.space, elem, params.rho, params.body_force)
        self.body_force_enabled = bool(np.linalg.norm(params.body_force) > 1e-15)
        self._body_vec = jnp.asarray(bf, dtype=self.dtype)

        if params.type_lin == "Direct":
            if self.space.n_dofs > 16384:
                raise ValueError(
                    f"type_lin='Direct' assembles the dense "
                    f"({self.space.n_dofs}, {self.space.n_dofs}) stepping "
                    f"matrix on host; capped at 16384 unknowns. Use "
                    f"type_lin='CG' for this size."
                )
            A_dense = assemble_dense(self.space, A_e)
            flat_mask = np.asarray(self.mask, dtype=np.float64).reshape(-1)
            A_dense = A_dense * flat_mask[:, None] * flat_mask[None, :]
            np.fill_diagonal(A_dense, np.diag(A_dense) + (1.0 - flat_mask))
            self._direct = DenseCholesky(A_dense)
        else:
            self._direct = None

        self._max_cg_iter = int(self.space.n_dofs * params.max_iterations_lin)
        self._step = jax.jit(self._make_step())

    # ------------------------------------------------------------------

    def initial_state(self) -> LinearState:
        z = jnp.zeros((self.space.n_nodes, self.space.dim), dtype=self.dtype)
        return LinearState(displacement=z, velocity=z, old_load=z)

    def masked_operator(self, op):
        """BC-eliminated SPD action: identity on constrained DoFs."""
        mask = self.mask
        shard = self._shard

        def apply(v):
            return shard(mask * op(mask * v) + (1.0 - mask) * v)

        return apply

    def assemble_load(self, interface_data: jnp.ndarray) -> jnp.ndarray:
        """F_{n+1}: coupling load + body force (`linear_elasticity.cc:384-395`)."""
        if self.params.data_consistent:
            F = self.face_load(interface_data)
        else:
            F = interface_data
        if self.body_force_enabled:
            F = F + self._body_vec
        return F

    def _make_step(self):
        params = self.params
        dt, theta = params.delta_t, params.theta
        K, M = self.K, self.M
        A_bc = self.masked_operator(self.A)
        mask = self.mask
        mask_lo = self.mask_lo
        A_lo = self.A_lo
        lo_dtype = self.solve_dtype
        mixed = self._mixed
        precond = self._precond
        use_cg = params.type_lin == "CG"
        direct = self._direct
        max_iter = self._max_cg_iter

        shard = self._shard

        def A_lo_bc(v):
            return shard(mask_lo * A_lo(mask_lo * v) + (1.0 - mask_lo) * v)

        def step(state: LinearState, interface_data: jnp.ndarray):
            F_new = self.assemble_load(interface_data)
            rhs = (
                dt * theta * F_new
                + dt * (1.0 - theta) * state.old_load
                + M(state.velocity)
                - (theta * (1.0 - theta) * dt * dt) * K(state.velocity)
                - dt * K(state.displacement)
            )
            rhs = shard(mask * rhs)  # zero-valued Dirichlet rows

            if use_cg and mixed:
                # f32 CG + f64 defect correction meets the absolute 1e-10
                # contract (:542-543) with the Krylov flops in f32
                res = ir_cg_solve(
                    A_bc, A_lo_bc,
                    rhs,
                    mask * state.velocity,
                    tol=1e-10,
                    max_iter=max_iter,
                    lo_dtype=lo_dtype,
                    preconditioner=precond,
                )
                v_new, iters, resn = res.x, res.iterations, res.residual_norm
            elif use_cg:
                res = cg_solve(
                    A_bc,
                    rhs,
                    mask * state.velocity,
                    tol=1e-10,  # hardcoded in the reference (:542-543)
                    max_iter=max_iter,
                    preconditioner=precond,
                )
                v_new, iters, resn = res.x, res.iterations, res.residual_norm
            else:
                v_new = direct.solve(rhs)
                iters = jnp.int32(1)
                resn = jnp.asarray(0.0, dtype=rhs.dtype)

            d_new = (
                state.displacement
                + dt * theta * v_new
                + dt * (1.0 - theta) * state.velocity
            )
            info = StepInfo(
                iterations=iters,
                residual=resn,
                linf_velocity=jnp.max(jnp.abs(v_new)),
            )
            return LinearState(d_new, v_new, F_new), info

        return step

    def step(
        self, state: LinearState, interface_data: jnp.ndarray
    ) -> Tuple[LinearState, StepInfo]:
        """One theta-step. `interface_data` is the (n_nodes, dim) nodal
        coupling field (stress for consistent, forces for conservative
        reads), zero off the interface."""
        return self._step(state, interface_data)

    def jittable_step(self):
        """The pure (un-jitted) step function `(state, data) -> (state,
        info)` — the public surface for wrapping in jax transforms."""
        return self._make_step()

    def with_delta_t(self, delta_t: float) -> "LinearElastodynamics":
        """A solver clone stepping with a different dt on the same mesh,
        memoized per dt. Supports subcycling: a coupling window that is not
        an integer multiple of delta_t is closed with a shortened cached
        stepper (`adapter.h:104-107`, `time_handler.h:63-70`). The stepping
        matrix M + (theta dt)^2 K and its preconditioner depend on dt, so
        the clone rebuilds them once and reuses its compiled step."""
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
                device_mesh=self.device_mesh,
            )
        return cache[key]
