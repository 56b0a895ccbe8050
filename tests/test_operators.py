"""Element-operator validation against independent ground truth:
dense numpy assembly, physics invariants (patch test, total mass), and
MMS convergence of the static elasticity solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import (
    ElementMatrices,
    assemble_dense,
    body_force_vector,
    make_face_loading,
    make_operator,
)
from dealii_adapter_tpu.solvers.cg import (
    cg_solve,
    chebyshev_preconditioner,
    estimate_lambda_max,
    jacobi_preconditioner,
)

LMBDA, MU, RHO = 2.0e6, 0.5e6, 1000.0


def make_space(dim=2, degree=2, reps=(3, 2, 2), size=(0.3, 0.2, 0.2)):
    m = subdivided_hyper_rectangle(reps[:dim], [0.0] * dim, size[:dim], degree)
    return DofSpace.create(m)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 3), (3, 2)])
def test_matrix_free_matches_dense(dim, degree):
    space = make_space(dim, degree)
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    rng = np.random.default_rng(1)
    u = rng.normal(size=(space.n_nodes, dim))
    for E in (elem.K_e, elem.M_e):
        op = make_operator(space, E)
        got = np.asarray(op(jnp.asarray(u)))
        A = assemble_dense(space, E)
        want = (A @ u.reshape(-1)).reshape(space.n_nodes, dim)
        assert np.allclose(got, want, rtol=1e-12, atol=1e-9)


def test_element_matrices_symmetric_spd():
    space = make_space(2, 2)
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    assert np.allclose(elem.K_e, elem.K_e.T, atol=1e-10)
    assert np.allclose(elem.M_e, elem.M_e.T, atol=1e-10)
    # K is PSD (rigid modes in kernel), M is PD
    wK = np.linalg.eigvalsh(elem.K_e)
    wM = np.linalg.eigvalsh(elem.M_e)
    assert wK.min() > -1e-6 * wK.max()
    assert wM.min() > 0


def test_stiffness_kernel_contains_rigid_modes():
    """K annihilates translations and the linearized rotation."""
    space = make_space(2, 2)
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    K = make_operator(space, elem.K_e)
    x = space.mesh.nodes
    for u in (
        np.tile([1.0, 0.0], (space.n_nodes, 1)),
        np.tile([0.0, 1.0], (space.n_nodes, 1)),
        np.stack([-x[:, 1], x[:, 0]], axis=1),  # infinitesimal rotation
    ):
        r = np.asarray(K(jnp.asarray(u)))
        assert np.max(np.abs(r)) < 1e-6 * max(np.max(np.abs(u)), 1.0)


def test_patch_test_linear_field():
    """For affine u, stress is constant -> interior residual of K u vanishes
    (surface terms land only on boundary nodes)."""
    space = make_space(2, 3)
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    K = make_operator(space, elem.K_e)
    x = space.mesh.nodes
    A = np.array([[0.3, -0.1], [0.2, 0.5]])
    u = x @ A.T
    r = np.asarray(K(jnp.asarray(u)))
    boundary = set()
    for ids in space.boundary_nodes.values():
        boundary.update(ids.tolist())
    interior = np.setdiff1d(np.arange(space.n_nodes), sorted(boundary))
    assert len(interior) > 0
    assert np.max(np.abs(r[interior])) < 1e-6


def test_mass_total():
    space = make_space(2, 2, reps=(3, 2), size=(0.3, 0.2))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    M = make_operator(space, elem.M_e)
    ones = jnp.ones((space.n_nodes, 2))
    total = np.asarray(M(ones)).sum(axis=0)
    vol = 0.3 * 0.2
    assert np.allclose(total, RHO * vol, rtol=1e-12)


def test_body_force_vector_total():
    space = make_space(3, 1, reps=(2, 2, 2), size=(1.0, 1.0, 1.0))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    bf = body_force_vector(space, elem, RHO, (0.0, -9.81, 0.0))
    assert np.allclose(bf.sum(axis=0), [0.0, -9.81 * RHO, 0.0], rtol=1e-12)


def test_face_loading_constant_traction():
    """Constant traction t on a face integrates to t * area, consistently
    distributed; total equals the exact surface integral."""
    space = make_space(2, 3, reps=(3, 2), size=(0.3, 0.2))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    # use boundary id 1 (x = 0.3 face), length 0.2
    fl = make_face_loading(space, elem, interface_id=1)
    t = np.zeros((space.n_nodes, 2))
    t[:, 0] = 7.5
    r = np.asarray(fl(jnp.asarray(t)))
    assert np.allclose(r.sum(axis=0), [7.5 * 0.2, 0.0], rtol=1e-12)
    # load lands only on the boundary-1 nodes
    mask = np.zeros(space.n_nodes, bool)
    mask[space.boundary_nodes[1]] = True
    assert np.allclose(r[~mask], 0.0)


def _dirichlet_all_boundaries(space):
    mask = np.ones((space.n_nodes, space.dim))
    for ids in space.boundary_nodes.values():
        mask[ids] = 0.0
    return mask


def _consistent_rhs(space, f):
    """Exact consistent load vector for body force field f(x) via cell
    quadrature (independent numpy implementation for MMS tests)."""
    tab = space.tab
    h = space.mesh.cell_h
    detJ = np.prod(h)
    origins = space.mesh.nodes[space.cells[:, 0]]  # (n_cells, dim)
    xq = origins[:, None, :] + tab.q_points[None, :, :] * h  # (c, q, dim)
    fq = f(xq.reshape(-1, space.dim)).reshape(xq.shape)  # (c, q, dim)
    rc = np.einsum("q,qn,cqd->cnd", tab.q_weights * detJ, tab.N, fq)
    flat = np.concatenate([rc.reshape(-1, space.dim), np.zeros((1, space.dim))])
    return flat[space.plan].sum(axis=1)


def _mms_error(degree, reps):
    """Static solve K u = f with u=0 on the whole boundary; returns nodal
    Linf error vs the manufactured solution."""
    space = make_space(2, degree, reps=reps, size=(1.0, 1.0))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    K = make_operator(space, elem.K_e)
    mask = jnp.asarray(_dirichlet_all_boundaries(space))

    pi = np.pi

    def u_exact(x):
        s = np.sin(pi * x[:, 0]) * np.sin(pi * x[:, 1])
        return np.stack([s, 0.5 * s], axis=1)

    def f_body(x):
        # f = -div sigma(u) for u = (s, s/2), s = sin(pi x) sin(pi y)
        sx = np.sin(pi * x[:, 0])
        sy = np.sin(pi * x[:, 1])
        cx = np.cos(pi * x[:, 0])
        cy = np.cos(pi * x[:, 1])
        s = sx * sy
        # laplacian of s = -2 pi^2 s ; d2s/dxdy = pi^2 cx cy
        u_xx = -(pi**2) * s
        u_yy = -(pi**2) * s
        u_xy = pi**2 * cx * cy
        # sigma = lmbda tr(eps) I + 2 mu eps, u=(s, s/2)
        # div sigma_x = (lmbda+2mu) u1_xx + mu u1_yy + (lmbda+mu) u2_xy
        f1 = -((LMBDA + 2 * MU) * u_xx + MU * u_yy + (LMBDA + MU) * 0.5 * u_xy)
        f2 = -((LMBDA + 2 * MU) * 0.5 * u_yy + MU * 0.5 * u_xx + (LMBDA + MU) * u_xy)
        return np.stack([f1, f2], axis=1)

    rhs = jnp.asarray(_consistent_rhs(space, f_body)) * mask

    def A_bc(v):
        return mask * K(mask * v) + (1 - mask) * v

    diag = mask * K.diagonal() + (1 - mask)
    res = cg_solve(
        A_bc,
        rhs,
        jnp.zeros_like(rhs),
        tol=1e-11,
        max_iter=20000,
        preconditioner=jacobi_preconditioner(diag),
    )
    assert bool(res.converged)
    err = np.asarray(res.x) - u_exact(space.mesh.nodes)
    return float(np.max(np.abs(err)))


@pytest.mark.parametrize("degree,rate_min", [(1, 1.7), (2, 2.7)])
def test_mms_convergence_rate(degree, rate_min):
    e1 = _mms_error(degree, (4, 4))
    e2 = _mms_error(degree, (8, 8))
    rate = np.log2(e1 / e2)
    assert rate > rate_min, (e1, e2, rate)


def test_cg_matches_dense_solve_and_jacobi_counts():
    space = make_space(2, 2, reps=(4, 3), size=(0.4, 0.3))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    Ae = elem.M_e + 0.01 * elem.K_e
    op = make_operator(space, Ae)
    mask = jnp.asarray(_dirichlet_all_boundaries(space))

    def A_bc(v):
        return mask * op(mask * v) + (1 - mask) * v

    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=(space.n_nodes, 2))) * mask
    diag = mask * op.diagonal() + (1 - mask)
    res = cg_solve(
        A_bc, b, jnp.zeros_like(b), tol=1e-10, max_iter=5000,
        preconditioner=jacobi_preconditioner(diag),
    )
    assert bool(res.converged)
    A = assemble_dense(space, Ae)
    fm = np.asarray(mask).reshape(-1)
    A = A * fm[:, None] * fm[None, :]
    np.fill_diagonal(A, np.diag(A) + (1 - fm))
    want = np.linalg.solve(A, np.asarray(b).reshape(-1))
    assert np.allclose(np.asarray(res.x).reshape(-1), want, atol=1e-8)
    # unpreconditioned CG must need more iterations than Jacobi-PCG
    res_plain = cg_solve(A_bc, b, jnp.zeros_like(b), tol=1e-10, max_iter=5000)
    assert int(res.iterations) <= int(res_plain.iterations)


def test_chebyshev_preconditioner_reduces_iterations():
    space = make_space(2, 3, reps=(5, 5), size=(1.0, 1.0))
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    op = make_operator(space, elem.K_e)
    mask = jnp.asarray(_dirichlet_all_boundaries(space))

    def A_bc(v):
        return mask * op(mask * v) + (1 - mask) * v

    diag = mask * op.diagonal() + (1 - mask)
    lmax = estimate_lambda_max(A_bc, diag, (space.n_nodes, 2))
    cheb = chebyshev_preconditioner(A_bc, diag, float(lmax), degree=4)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.normal(size=(space.n_nodes, 2))) * mask
    res_j = cg_solve(
        A_bc, b, jnp.zeros_like(b), tol=1e-9, max_iter=20000,
        preconditioner=jacobi_preconditioner(diag),
    )
    res_c = cg_solve(
        A_bc, b, jnp.zeros_like(b), tol=1e-9, max_iter=20000,
        preconditioner=cheb,
    )
    assert bool(res_c.converged)
    assert int(res_c.iterations) < int(res_j.iterations) / 2
    # both give the same solution
    assert np.allclose(np.asarray(res_c.x), np.asarray(res_j.x), atol=1e-6)
