"""Sum-factorized cell operators for tensor-product (Q_p hex) elements.

The straightforward evaluation of the displacement gradient at cell
quadrature points contracts the full tabulation ``G (q, npc, dim)`` with
the cell patch tensor — 9 dense ``(q, npc) @ (npc, c)`` products per
residual plus 9 more for the adjoint.  On TPU generations without native
f64 (v5e emulates it in software), those matmuls are compute-bound and
dominate the f64 Newton-residual cost (measured 22 ms of a 50 ms residual
at 1M DoF).

Because the basis is a tensor product ``N = V_z x V_y x V_x`` (GLL Lagrange
x Gauss points, `fem/tabulation.py:146-170`), the same contraction
factorizes into per-axis 1D stages with ~13x fewer multiplies:

    t   = V_z u          (interp z)      td  = D_z u
    tV  = V_y t          tD = D_y t      tdV = V_y td
    g_x = D_x tV         g_y = V_x tD    g_z = V_x tdV

and the adjoint (quadrature-weighted test-function contraction) is the
exact transpose chain with the 1D Gauss weights absorbed into the
transposed stage matrices.  This is the standard spectral-element
evaluation (deal.II's ``CellwiseEvaluator``/FEEvaluation does the same on
CPU); here each stage is one small ``(q1, p1)`` matmul against the huge
trailing cell axis, which XLA lowers to efficient (emulated-f64) dots.

Replaces the per-cell QP loops consumed from deal.II ``FEValues`` by the
reference (`nonlinear_elasticity.cc:921-996`, `linear_elasticity.cc:276-345`)
on the hot f64 paths; results agree with the dense-tabulation formulation
to roundoff (different summation order only).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..fem.tabulation import gauss_legendre, lagrange_basis


@dataclasses.dataclass(frozen=True)
class SumfactBasis:
    """1D stage matrices for sum-factorized cell evaluation (3D).

    V: (q1, p1) 1D shape values at Gauss points; D[e]: (q1, p1) 1D shape
    derivatives scaled by 1/h[e] (physical gradients). Vw/Dw[e]: weighted
    transposes (p1, q1) with the 1D Gauss weights absorbed; the cell
    volume detJ is absorbed into the z-axis transposes once.
    """

    V: jnp.ndarray
    D: Tuple[jnp.ndarray, ...]  # per physical axis e = x, y, z
    Vw: jnp.ndarray
    Vw_z: jnp.ndarray
    Dw: Tuple[jnp.ndarray, ...]
    Dw_z: Tuple[jnp.ndarray, ...]
    q1: int
    p1: int

    @property
    def n_q(self) -> int:
        return self.q1 ** 3

    @property
    def npc(self) -> int:
        return self.p1 ** 3


def make_sumfact_basis(tab, cell_h, dtype) -> SumfactBasis:
    """Build the 1D factors from a 3D Tabulation + uniform cell size."""
    assert tab.dim == 3, "sum-factorization path is for the 3D hex elements"
    h = np.asarray(cell_h, dtype=np.float64)
    detJ = float(np.prod(h))
    q1pts, w1 = gauss_legendre(tab.n_q_1d)
    V1, D1 = lagrange_basis(tab.support_1d, q1pts)  # (q1, p1) each
    V = jnp.asarray(V1, dtype=dtype)
    D = tuple(jnp.asarray(D1 / h[e], dtype=dtype) for e in range(3))
    Vw1 = (V1 * w1[:, None]).T  # (p1, q1)
    Dw1 = [(D1 / h[e] * w1[:, None]).T for e in range(3)]
    return SumfactBasis(
        V=V,
        D=D,
        Vw=jnp.asarray(Vw1, dtype=dtype),
        Vw_z=jnp.asarray(Vw1 * detJ, dtype=dtype),
        Dw=tuple(jnp.asarray(m, dtype=dtype) for m in Dw1),
        Dw_z=tuple(jnp.asarray(m * detJ, dtype=dtype) for m in Dw1),
        q1=tab.n_q_1d,
        p1=tab.degree + 1,
    )


def grad_cellwise(ut: jnp.ndarray, sf: SumfactBasis) -> List[List[jnp.ndarray]]:
    """(dim, npc, c) cell patches -> grad[d][e] (n_q, c) at quadrature
    points, via 3 x 8 1D-stage contractions instead of 9 dense products.
    Local node / q-point index order is z-major x-fastest (tabulation
    convention, `fem/tabulation.py:83-93,187-196`)."""
    dim, npc, c = ut.shape
    p1, q1 = sf.p1, sf.q1
    grad: List[List[jnp.ndarray]] = []
    for d in range(dim):
        u = ut[d].reshape(p1, p1, p1, c)  # (z, y, x, cells)
        t = jnp.einsum("Za,abcn->Zbcn", sf.V, u)
        td = jnp.einsum("Za,abcn->Zbcn", sf.D[2], u)
        tV = jnp.einsum("Yb,Zbcn->ZYcn", sf.V, t)
        tD = jnp.einsum("Yb,Zbcn->ZYcn", sf.D[1], t)
        tdV = jnp.einsum("Yb,Zbcn->ZYcn", sf.V, td)
        gx = jnp.einsum("Xc,ZYcn->ZYXn", sf.D[0], tV)
        gy = jnp.einsum("Xc,ZYcn->ZYXn", sf.V, tD)
        gz = jnp.einsum("Xc,ZYcn->ZYXn", sf.V, tdV)
        grad.append([g.reshape(q1 ** 3, c) for g in (gx, gy, gz)])
    return grad


def project_cellwise(P: List[List[jnp.ndarray]], sf: SumfactBasis) -> jnp.ndarray:
    """Adjoint of :func:`grad_cellwise` with quadrature weights applied:
    rt[d] (npc, c) = sum_e (w-weighted gradient test functions) : P[d][e].
    Exactly the transpose stage chain; weights/detJ live in Vw/Dw."""
    dim = len(P)
    q1, p1 = sf.q1, sf.p1
    outs = []
    for d in range(dim):
        Px = P[d][0].reshape(q1, q1, q1, -1)
        Py = P[d][1].reshape(q1, q1, q1, -1)
        Pz = P[d][2].reshape(q1, q1, q1, -1)
        # x-stage
        A = jnp.einsum("cX,ZYXn->ZYcn", sf.Dw[0], Px)
        B = jnp.einsum("cX,ZYXn->ZYcn", sf.Vw, Py)
        C = jnp.einsum("cX,ZYXn->ZYcn", sf.Vw, Pz)
        # y-stage (x and y derivative terms share the remaining chain)
        AB = jnp.einsum("bY,ZYcn->Zbcn", sf.Vw, A) + jnp.einsum(
            "bY,ZYcn->Zbcn", sf.Dw[1], B
        )
        C2 = jnp.einsum("bY,ZYcn->Zbcn", sf.Vw, C)
        # z-stage
        out = jnp.einsum("aZ,Zbcn->abcn", sf.Vw_z, AB) + jnp.einsum(
            "aZ,Zbcn->abcn", sf.Dw_z[2], C2
        )
        outs.append(out.reshape(p1 ** 3, -1))
    return jnp.stack(outs, axis=0)


def interp_cellwise(ut: jnp.ndarray, sf: SumfactBasis) -> jnp.ndarray:
    """(dim, npc, c) -> (dim, n_q, c): values at quadrature points."""
    dim, npc, c = ut.shape
    p1, q1 = sf.p1, sf.q1
    u = ut.reshape(dim, p1, p1, p1, c)
    t = jnp.einsum("Za,dabcn->dZbcn", sf.V, u)
    t = jnp.einsum("Yb,dZbcn->dZYcn", sf.V, t)
    t = jnp.einsum("Xc,dZYcn->dZYXn", sf.V, t)
    return t.reshape(dim, q1 ** 3, c)


def interp_adjoint_cellwise(fq: jnp.ndarray, sf: SumfactBasis) -> jnp.ndarray:
    """(dim, n_q, c) -> (dim, npc, c): weighted test-function contraction
    (quadrature weights + detJ absorbed)."""
    dim, nq, c = fq.shape
    q1, p1 = sf.q1, sf.p1
    f = fq.reshape(dim, q1, q1, q1, c)
    t = jnp.einsum("cX,dZYXn->dZYcn", sf.Vw, f)
    t = jnp.einsum("bY,dZYcn->dZbcn", sf.Vw, t)
    t = jnp.einsum("aZ,dZbcn->dabcn", sf.Vw_z, t)
    return t.reshape(dim, p1 ** 3, c)


def internal_force_cellwise_sumfact(ut, sf: SumfactBasis, material):
    """Drop-in replacement for
    ``models.nonlinear_elasticity.internal_force_cellwise_T`` on 3D
    structured meshes: same (rt, min J) contract, same physics
    (`nonlinear_elasticity.cc:873-996`), sum-factorized contractions."""
    from ..models.material import kinematics_c

    dim = ut.shape[0]
    grad = grad_cellwise(ut, sf)
    F, J, F_inv, b_bar = kinematics_c(grad)
    tau = material.tau_c(J, b_bar)
    P = [
        [
            sum(tau[d][e] * F_inv[k][e] for e in range(dim))
            for k in range(dim)
        ]
        for d in range(dim)
    ]
    rt = project_cellwise(P, sf)
    return rt, jnp.min(J)


@dataclasses.dataclass(frozen=True)
class SumfactMassOperator:
    """rho-weighted consistent mass action on the structured lattice:
    extract -> 1D interp stages -> x(rho w detJ) -> adjoint stages ->
    overlap-add. Replaces the (edofs, edofs) element matmul of
    `StructuredOperator` for the f64 inertia term, where the dense product
    is emulation-compute-bound (measured 11.7 -> ~8 ms at 1M DoF f64)."""

    sf: SumfactBasis
    rho: float
    p: int
    reps_rev: Tuple[int, ...]
    grid_shape: Tuple[int, ...]
    dim: int = 3

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        from .structured import extract_cell_patches_T, overlap_add_T

        dim = self.dim
        u_grid = u.reshape(self.grid_shape + (dim,))
        ut = extract_cell_patches_T(u_grid, self.p, self.reps_rev)
        q = interp_cellwise(ut, self.sf)
        rt = interp_adjoint_cellwise(self.rho * q, self.sf)
        return overlap_add_T(rt, self.p, self.reps_rev, self.grid_shape).reshape(
            -1, dim
        )


def make_sumfact_mass_operator(space, rho: float, dtype) -> SumfactMassOperator:
    from .structured import _cells_shape, _grid_shape

    sf = make_sumfact_basis(space.tab, space.mesh.cell_h, dtype)
    return SumfactMassOperator(
        sf=sf,
        rho=float(rho),
        p=space.mesh.degree,
        reps_rev=_cells_shape(space),
        grid_shape=_grid_shape(space),
        dim=space.dim,
    )
