"""Batched, matrix-free element operators.

This is the TPU-native replacement for deal.II sparse assembly + SpMV on the
reference code path (stiffness: `linear_elasticity.cc:276-335`; consistent
mass: `:338-345`; face traction: `:457-521`; body force: `:357-373`).

Key design fact: the reference meshes are *uniform axis-aligned* structured
grids (`GridGenerator::subdivided_hyper_rectangle`), so every cell shares
one constant Jacobian and therefore one exact dense element matrix. The
global operator action becomes

    gather (n_cells, edofs) -> one MXU matmul with K_e -> transpose-gather

with zero sparse bookkeeping. The transpose-gather (precomputed plan, see
fem/dofspace.py) keeps the reduction scatter-free and deterministic.

Element DoF ordering: (local node, component), component fastest — i.e.
``edof = local_node * dim + comp`` — which is exactly the layout of
``u[cells].reshape(n_cells, -1)`` for node-major (n_nodes, dim) fields.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dofspace import DofSpace, build_transpose_gather_plan


# ---------------------------------------------------------------------------
# Host-side (numpy, float64) element matrix construction
# ---------------------------------------------------------------------------


class ElementMatrices:
    """Exact constant element matrices for a uniform axis-aligned cell.

    K_e: linear elastic stiffness with Lame parameters (lmbda, mu)
         (the weak form of `linear_elasticity.cc:299-321`)
    M_e: consistent mass with density rho (`linear_elasticity.cc:338-345`)
    face_mass[axis]: (npf, npf) face mass matrix including the face area
         Jacobian, for faces orthogonal to `axis`
    body_weights: (npc,) integral of each scalar shape function over a cell
    """

    def __init__(self, space: DofSpace, lmbda: float, mu: float, rho: float):
        tab = space.tab
        dim = space.dim
        h = np.asarray(space.mesh.cell_h, dtype=np.float64)
        detJ = float(np.prod(h))
        npc = tab.n_nodes

        # gradients in physical coords: G[q, n, d] = dN[q, n, d] / h[d]
        G = tab.dN / h[None, None, :]
        w = tab.q_weights * detJ

        # K[(i,ci),(j,cj)] = sum_q w [ lmbda G[q,i,ci] G[q,j,cj]
        #                            + mu    G[q,i,cj] G[q,j,ci]
        #                            + delta_{ci,cj} mu G[q,i,:].G[q,j,:] ]
        t1 = lmbda * np.einsum("q,qia,qjb->iajb", w, G, G)
        t2 = mu * np.einsum("q,qib,qja->iajb", w, G, G)
        lap = mu * np.einsum("q,qid,qjd->ij", w, G, G)
        t3 = np.einsum("ij,ab->iajb", lap, np.eye(dim))
        self.K_e = (t1 + t2 + t3).reshape(npc * dim, npc * dim)

        # M[(i,c),(j,c)] = rho sum_q w N_i N_j
        m_scalar = rho * np.einsum("q,qi,qj->ij", w, tab.N, tab.N)
        self.M_e = np.einsum("ij,ab->iajb", m_scalar, np.eye(dim)).reshape(
            npc * dim, npc * dim
        )

        # face mass per axis: restriction of the volume basis to face nodes
        # at face quadrature points equals the (dim-1)-D tensor basis
        self.face_mass = np.zeros((dim, tab.n_nodes_per_face, tab.n_nodes_per_face))
        for axis in range(dim):
            f = 2 * axis  # both sides share the same face mass
            Nf = tab.face_N[f][:, tab.face_nodes[f]]  # (nqf, npf)
            areaJ = detJ / h[axis]
            self.face_mass[axis] = areaJ * np.einsum(
                "q,qi,qj->ij", tab.face_q_weights, Nf, Nf
            )

        self.body_weights = np.einsum("q,qi->i", w, tab.N)  # (npc,)
        self.dim = dim
        self.npc = npc
        self.detJ = detJ


# ---------------------------------------------------------------------------
# Device-side application
# ---------------------------------------------------------------------------


def apply_plan(cell_values: jnp.ndarray, plan: jnp.ndarray) -> jnp.ndarray:
    """Transpose-gather reduction: (n_flat, dim) cell-local values ->
    (n_nodes, dim) global nodal sums. `plan` indexes into cell_values with
    one extra zero sentinel row appended here."""
    dim = cell_values.shape[-1]
    flat = jnp.concatenate(
        [cell_values, jnp.zeros((1, dim), dtype=cell_values.dtype)], axis=0
    )
    return flat[plan].sum(axis=1)


@dataclasses.dataclass(frozen=True)
class AssembledOperator:
    """Matrix-free action of a constant element matrix over all cells.

    Holds device arrays; `__call__` is pure/jittable. For the linear model
    this provides K, M and the theta-stepping matrix A = M + (theta dt)^2 K
    as closures over the same gather/plan arrays.
    """

    cells: jnp.ndarray  # (n_cells, npc) int32
    plan: jnp.ndarray  # (n_nodes, max_valence)
    E: jnp.ndarray  # (edofs, edofs) element matrix (symmetric)
    dim: int

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        n_cells, npc = self.cells.shape
        ucell = u[self.cells].reshape(n_cells, npc * self.dim)
        # "highest": true-f32 products (TPU default is one bf16 MXU pass,
        # too coarse for a Krylov operator); f64 follows the backend's own
        # emulation path untouched
        prec = "highest" if ucell.dtype == jnp.float32 else None
        rcell = jnp.dot(
            ucell, self.E,
            preferred_element_type=ucell.dtype, precision=prec,
        )
        return apply_plan(rcell.reshape(n_cells * npc, self.dim), self.plan)

    def diagonal(self) -> jnp.ndarray:
        """(n_nodes, dim) diagonal of the assembled global matrix (for the
        Jacobi/Chebyshev preconditioner replacing the reference's SSOR)."""
        n_cells, npc = self.cells.shape
        d = jnp.diag(self.E).reshape(npc, self.dim)
        dcell = jnp.broadcast_to(d, (n_cells, npc, self.dim))
        return apply_plan(dcell.reshape(n_cells * npc, self.dim), self.plan)


def make_operator(space: DofSpace, E: np.ndarray, dtype=jnp.float64) -> AssembledOperator:
    return AssembledOperator(
        cells=jnp.asarray(space.cells),
        plan=jnp.asarray(space.plan),
        E=jnp.asarray(E, dtype=dtype),
        dim=space.dim,
    )


def assemble_diagonal(space: DofSpace, E: np.ndarray) -> np.ndarray:
    """Host-side (n_nodes, dim) diagonal of the assembled global matrix.
    Setup-time only (Jacobi/Chebyshev preconditioners); avoids building
    device gather plans just to extract a diagonal."""
    dim = space.dim
    npc = space.cells.shape[1]
    d = np.diag(E).reshape(npc, dim)
    out = np.zeros((space.n_nodes, dim))
    np.add.at(out, space.cells, d)
    return out


def assemble_dense(space: DofSpace, E: np.ndarray) -> np.ndarray:
    """Host-side dense assembly of a constant element matrix — the global
    (n_dofs, n_dofs) matrix. Used by the Direct solver (the reference's
    UMFPACK path, `linear_elasticity.cc:556-563`) on small problems and by
    tests as ground truth against the matrix-free action."""
    dim = space.dim
    cells = space.cells
    n_cells, npc = cells.shape
    edofs = npc * dim
    gdof = (cells[:, :, None].astype(np.int64) * dim + np.arange(dim)).reshape(
        n_cells, edofs
    )
    A = np.zeros((space.n_dofs, space.n_dofs))
    rows = np.repeat(gdof, edofs, axis=1).ravel()
    cols = np.tile(gdof, (1, edofs)).ravel()
    np.add.at(A, (rows, cols), np.broadcast_to(E.ravel(), (n_cells, edofs * edofs)).ravel())
    return A


# ---------------------------------------------------------------------------
# Interface (Neumann) face loading
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FaceLoading:
    """Consistent surface-traction integration over the coupling interface.

    Replaces `assemble_consistent_loading` (`linear_elasticity.cc:457-521`):
    the interface traction field (nodal values, read from the coupling
    partner) is interpolated on each interface face and tested against the
    shape functions. Because only face nodes have support on a face, this
    collapses to one small face-mass matmul per face:

        r_face = M_face[axis(face)] @ t[face_nodes]

    followed by a face-local transpose-gather into the global vector.
    """

    face_nodes: jnp.ndarray  # (n_if, npf) global node ids
    face_mass: jnp.ndarray  # (n_if, npf, npf) per-face mass (by face axis)
    plan: jnp.ndarray  # (n_nodes, max_valence_f) into n_if*npf flat

    def __call__(self, traction: jnp.ndarray) -> jnp.ndarray:
        t = traction[self.face_nodes]  # (n_if, npf, dim)
        r = jnp.einsum("fij,fjc->fic", self.face_mass, t)
        n_if, npf, dim = t.shape
        return apply_plan(r.reshape(n_if * npf, dim), self.plan)


def make_face_loading(
    space: DofSpace, elem: ElementMatrices, interface_id: int, dtype=jnp.float64
) -> FaceLoading:
    faces, fnodes = space.interface_faces(interface_id)
    axes = faces[:, 1] // 2
    face_mass = elem.face_mass[axes]  # (n_if, npf, npf)
    plan, _ = build_transpose_gather_plan(fnodes, space.n_nodes)
    return FaceLoading(
        face_nodes=jnp.asarray(fnodes),
        face_mass=jnp.asarray(face_mass, dtype=dtype),
        plan=jnp.asarray(plan),
    )


def body_force_vector(
    space: DofSpace, elem: ElementMatrices, rho: float, body_force: Tuple[float, ...]
) -> np.ndarray:
    """(n_nodes, dim) consistent body-force load rho*b tested against shape
    functions (`linear_elasticity.cc:357-373`). Host-side, computed once."""
    n_cells, npc = space.cells.shape
    w = np.broadcast_to(elem.body_weights[None, :, None], (n_cells, npc, 1))
    flat = np.concatenate([w.reshape(-1, 1), np.zeros((1, 1))], axis=0)
    nodal_w = flat[space.plan].sum(axis=1)  # (n_nodes, 1)
    bf = np.asarray(body_force[: space.dim], dtype=np.float64)
    return rho * nodal_w * bf[None, :]
