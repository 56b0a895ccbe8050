"""Method-of-manufactured-solutions convergence tests.

The reference has no correctness tests at all (SURVEY.md §4); these pin the
discretization: a Q_p vector Lagrange space must reproduce degree-p
polynomial displacement fields exactly and converge at rate ~p+1 in L2 for
smooth manufactured solutions of static linear elasticity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, assemble_dense
from dealii_adapter_tpu.ops.structured import make_structured_operator
from dealii_adapter_tpu.solvers.cg import cg_solve, jacobi_preconditioner

LMBDA, MU = 1.2e6, 0.5e6


def _static_solve(space, u_exact_fn, f_fn):
    """Solve K u = M f + boundary terms with exact-Dirichlet everywhere
    (so no Neumann terms enter); returns nodal solution."""
    elem = ElementMatrices(space, LMBDA, MU, 1.0)
    K = make_structured_operator(space, elem.K_e)
    Mop = make_structured_operator(space, elem.M_e)  # rho=1 mass for L2 rhs

    nodes = space.mesh.nodes
    u_ex = jnp.asarray(u_exact_fn(nodes))
    f = jnp.asarray(f_fn(nodes))

    # Dirichlet on ALL boundaries with exact values
    bmask = np.ones((space.n_nodes, space.dim))
    for bid in space.mesh.boundary_faces:
        bmask[space.boundary_nodes[bid]] = 0.0
    bmask = jnp.asarray(bmask)

    rhs = bmask * (Mop(f) - K((1.0 - bmask) * u_ex))

    def A(v):
        return bmask * K(bmask * v) + (1.0 - bmask) * v

    from dealii_adapter_tpu.ops.element_ops import assemble_diagonal

    diag = bmask * jnp.asarray(assemble_diagonal(space, elem.K_e)) + (1 - bmask)
    res = cg_solve(
        A, rhs, jnp.zeros_like(rhs), tol=1e-12 * float(jnp.abs(rhs).max() + 1),
        max_iter=20000, preconditioner=jacobi_preconditioner(diag),
    )
    return res.x + (1.0 - bmask) * u_ex, u_ex


def _l2_error(space, uh, u_ex_fn):
    """Quadrature L2 error against the exact field."""
    tab = space.tab
    h = space.mesh.cell_h
    detJ = float(np.prod(h))
    ucell = np.asarray(uh)[space.cells]  # (c, npc, dim)
    uq = np.einsum("qn,cnd->cqd", tab.N, ucell)
    # physical quadrature points
    Xc = space.mesh.nodes[space.cells]  # (c,npc,dim)
    Xq = np.einsum("qn,cnd->cqd", tab.N, Xc)
    diff = uq - u_ex_fn(Xq.reshape(-1, space.dim)).reshape(uq.shape)
    return float(
        np.sqrt(np.sum(tab.q_weights[None, :, None] * detJ * diff**2))
    )


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_exact_polynomial_reproduction(degree):
    """A degree-p polynomial displacement with matching body force is
    reproduced to solver tolerance on a coarse mesh (patch test +)."""

    def u_exact(x):
        # u = (x^p, y^p scaled); for p=1 this is the classic patch test
        return np.stack(
            [x[:, 0] ** degree, 0.5 * x[:, 1] ** degree], axis=1
        )

    def body(x):
        # f = -div sigma(u);  sigma = lmbda tr(eps) I + 2 mu eps
        p = degree
        if p == 1:
            return np.zeros_like(x)
        d2x = p * (p - 1) * x[:, 0] ** (p - 2)
        d2y = p * (p - 1) * x[:, 1] ** (p - 2)
        fx = -(LMBDA + 2 * MU) * d2x
        fy = -0.5 * (LMBDA + 2 * MU) * d2y
        return np.stack([fx, fy], axis=1)

    mesh = subdivided_hyper_rectangle((3, 3), [0, 0], [1, 1], degree)
    space = DofSpace.create(mesh, n_q_1d=degree + 2)
    uh, u_ex = _static_solve(space, u_exact, body)
    err = float(jnp.max(jnp.abs(uh - u_ex)))
    assert err < 5e-9 * max(1.0, float(jnp.abs(u_ex).max())), err


@pytest.mark.parametrize("degree,min_rate", [(1, 1.8), (2, 2.8)])
def test_mms_convergence_rate(degree, min_rate):
    """Smooth (trigonometric) manufactured solution: L2 error must drop at
    ~(p+1) with mesh refinement."""
    k = np.pi

    def u_exact(x):
        return np.stack(
            [
                np.sin(k * x[:, 0]) * np.sin(k * x[:, 1]),
                np.cos(k * x[:, 0]) * np.cos(k * x[:, 1]),
            ],
            axis=1,
        )

    def body(x):
        s0, s1 = np.sin(k * x[:, 0]), np.sin(k * x[:, 1])
        c0, c1 = np.cos(k * x[:, 0]), np.cos(k * x[:, 1])
        # u1 = s0 s1, u2 = c0 c1
        # eps and div(sigma) computed analytically:
        # d11 u1 = -k^2 s0 s1 ; d22 u1 = -k^2 s0 s1 ; d12 u1 = k^2 c0 c1
        # d11 u2 = -k^2 c0 c1 ; d22 u2 = -k^2 c0 c1 ; d12 u2 = k^2 s0 s1
        lap1 = -2 * k**2 * s0 * s1
        lap2 = -2 * k**2 * c0 * c1
        # div u = k c0 s1 - k c0 s1 = 0 (divergence-free field), so
        # -div sigma = -mu lap u exactly
        f1 = -MU * lap1
        f2 = -MU * lap2
        return np.stack([f1, f2], axis=1)

    errors = []
    for n in (4, 8):
        mesh = subdivided_hyper_rectangle((n, n), [0, 0], [1, 1], degree)
        space = DofSpace.create(mesh, n_q_1d=degree + 2)
        uh, _ = _static_solve(space, u_exact, body)
        errors.append(_l2_error(space, uh, u_exact))
    rate = np.log2(errors[0] / errors[1])
    assert rate > min_rate, (errors, rate)
