import numpy as np
import pytest

from dealii_adapter_tpu.fem.tabulation import (
    gauss_legendre,
    gauss_lobatto_points,
    lagrange_basis,
    tabulate,
)


def test_gauss_legendre_exactness():
    # n-point Gauss integrates polys up to degree 2n-1 exactly on [0,1]
    for n in range(1, 8):
        x, w = gauss_legendre(n)
        for p in range(2 * n):
            exact = 1.0 / (p + 1)
            assert np.isclose(np.sum(w * x**p), exact, atol=1e-13), (n, p)


def test_gauss_lobatto_points():
    assert np.allclose(gauss_lobatto_points(1), [0, 1])
    # degree 2: endpoints + midpoint
    assert np.allclose(gauss_lobatto_points(2), [0, 0.5, 1])
    # degree 3 GLL interior points: (1 ± 1/sqrt(5))/2
    p3 = gauss_lobatto_points(3)
    assert np.allclose(p3, [0, 0.5 - 0.5 / np.sqrt(5), 0.5 + 0.5 / np.sqrt(5), 1])
    # symmetric and sorted for higher degrees
    for deg in range(2, 9):
        p = gauss_lobatto_points(deg)
        assert len(p) == deg + 1
        assert np.all(np.diff(p) > 0)
        assert np.allclose(p + p[::-1], 1.0)


def test_lagrange_basis_kronecker_and_partition_of_unity():
    for deg in (1, 2, 3, 4):
        nodes = gauss_lobatto_points(deg)
        v, _ = lagrange_basis(nodes, nodes)
        assert np.allclose(v, np.eye(deg + 1), atol=1e-12)
        x = np.linspace(0, 1, 17)
        v, d = lagrange_basis(nodes, x)
        assert np.allclose(v.sum(axis=1), 1.0, atol=1e-12)
        assert np.allclose(d.sum(axis=1), 0.0, atol=1e-10)


def test_lagrange_derivative_fd():
    nodes = gauss_lobatto_points(3)
    x = np.array([0.3, 0.71])
    eps = 1e-6
    vp, _ = lagrange_basis(nodes, x + eps)
    vm, _ = lagrange_basis(nodes, x - eps)
    _, d = lagrange_basis(nodes, x)
    assert np.allclose(d, (vp - vm) / (2 * eps), atol=1e-8)


@pytest.mark.parametrize("dim,deg", [(2, 1), (2, 3), (3, 1), (3, 2)])
def test_tabulation_shapes_and_pou(dim, deg):
    tab = tabulate(dim, deg, deg + 1)
    npc = (deg + 1) ** dim
    nq = (deg + 1) ** dim
    assert tab.N.shape == (nq, npc)
    assert tab.dN.shape == (nq, npc, dim)
    assert np.allclose(tab.N.sum(axis=1), 1.0)
    assert np.allclose(tab.dN.sum(axis=1), 0.0, atol=1e-10)
    # quadrature weights integrate the unit cell
    assert np.isclose(tab.q_weights.sum(), 1.0)
    assert np.isclose(tab.face_q_weights.sum(), 1.0)
    # mass of the reference element = sum_q w_q N_i N_j summed = 1
    Me = np.einsum("q,qi,qj->ij", tab.q_weights, tab.N, tab.N)
    assert np.isclose(Me.sum(), 1.0)


@pytest.mark.parametrize("dim,deg", [(2, 2), (3, 2)])
def test_face_tabulation_consistency(dim, deg):
    tab = tabulate(dim, deg, deg + 1)
    npf = (deg + 1) ** (dim - 1)
    assert tab.face_nodes.shape == (2 * dim, npf)
    for f in range(2 * dim):
        axis, side = f // 2, f % 2
        # nodes on the face have the right ref coordinate
        coords = tab.nodes[tab.face_nodes[f]]
        assert np.allclose(coords[:, axis], float(side))
        # volume basis evaluated on the face: only face nodes contribute
        vals = tab.face_N[f]  # (nqf, npc)
        off_face = np.setdiff1d(np.arange(tab.n_nodes), tab.face_nodes[f])
        # restriction of the volume basis at face qps to face nodes equals the
        # (dim-1)-D tensor basis: partition of unity on the face
        assert np.allclose(vals[:, off_face], 0.0, atol=1e-12)
        assert np.allclose(vals.sum(axis=1), 1.0)
        # outward normal
        n = np.zeros(dim)
        n[axis] = -1.0 if side == 0 else 1.0
        assert np.allclose(tab.face_normal_ref[f], n)


def test_interpolation_exactness():
    # a Q_deg tabulation interpolates polynomials of per-axis degree deg exactly
    dim, deg = 2, 3
    tab = tabulate(dim, deg, deg + 1)

    def f(p):
        return p[:, 0] ** 3 + 2 * p[:, 1] ** 3 - p[:, 0] * p[:, 1] ** 2

    nodal = f(tab.nodes)
    at_q = tab.N @ nodal
    assert np.allclose(at_q, f(tab.q_points), atol=1e-12)
    # gradient check
    gx = 3 * tab.q_points[:, 0] ** 2 - tab.q_points[:, 1] ** 2
    gy = 6 * tab.q_points[:, 1] ** 2 - 2 * tab.q_points[:, 0] * tab.q_points[:, 1]
    grad = np.einsum("qnd,n->qd", tab.dN, nodal)
    assert np.allclose(grad, np.stack([gx, gy], axis=1), atol=1e-11)
