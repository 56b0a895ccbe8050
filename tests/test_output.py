"""VTK writer + strain postprocessor + timer tests."""

import base64
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.utils import TimerOutput, compute_nodal_strain, write_vtu
from dealii_adapter_tpu.utils.vtk import vtk_lagrange_perm


def _decode(da):
    raw = base64.b64decode(da.text.strip())
    (nbytes,) = struct.unpack("<Q", raw[:8])
    body = raw[8 : 8 + nbytes]
    dtype = {
        "Float64": np.float64,
        "Int64": np.int64,
        "UInt8": np.uint8,
    }[da.attrib["type"]]
    return np.frombuffer(body, dtype=dtype)


def _read_vtu(path):
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    arrays = {}
    for da in piece.iter("DataArray"):
        arrays[da.attrib["Name"]] = _decode(da)
    return piece, arrays


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 3), (3, 1), (3, 2)])
def test_vtk_perm_is_bijection_and_corners(dim, degree):
    perm = vtk_lagrange_perm(degree, dim)
    n = (degree + 1) ** dim
    assert sorted(perm.tolist()) == list(range(n))
    # VTK corner 0 is lexicographic node 0; VTK corner 1 is (p,0[,0])
    assert perm[0] == 0
    assert perm[1] == degree


def test_hex_degree2_node_slots_match_vtk_point_index_from_ijk():
    """Pin the full degree-2 Lagrange hexahedron layout of VTK's
    PointIndexFromIJK (also deal.II's vtk_point_index_from_ijk): 8 corners,
    12 edge midpoints in hex edge order ({0,1},{1,2},{3,2},{0,3}, top ring,
    then vertical {0,4},{1,5},{3,7},{2,6}), 6 face centers (-x,+x,-y,+y,-z,+z),
    1 body center. Guards the k-axis-edge corner factor (the vertical edges
    above corners 2 and 3 are easy to swap)."""
    perm = vtk_lagrange_perm(2, 3)  # lex index for each VTK slot

    def lex(i, j, k):
        return i + 3 * (j + 3 * k)

    expected = [
        # corners 0-7
        lex(0, 0, 0), lex(2, 0, 0), lex(2, 2, 0), lex(0, 2, 0),
        lex(0, 0, 2), lex(2, 0, 2), lex(2, 2, 2), lex(0, 2, 2),
        # bottom edges {0,1},{1,2},{3,2},{0,3}
        lex(1, 0, 0), lex(2, 1, 0), lex(1, 2, 0), lex(0, 1, 0),
        # top edges {4,5},{5,6},{7,6},{4,7}
        lex(1, 0, 2), lex(2, 1, 2), lex(1, 2, 2), lex(0, 1, 2),
        # vertical edges {0,4},{1,5},{3,7},{2,6}
        lex(0, 0, 1), lex(2, 0, 1), lex(0, 2, 1), lex(2, 2, 1),
        # faces -x,+x,-y,+y,-z,+z
        lex(0, 1, 1), lex(2, 1, 1), lex(1, 0, 1), lex(1, 2, 1),
        lex(1, 1, 0), lex(1, 1, 2),
        # body center
        lex(1, 1, 1),
    ]
    np.testing.assert_array_equal(perm, expected)


@pytest.mark.parametrize("dim,degree", [(2, 2), (3, 2)])
def test_linear_field_uniform_strain(dim, degree):
    reps = (2, 2) if dim == 2 else (2, 2, 1)
    mesh = subdivided_hyper_rectangle(reps, [0] * dim, [1] * dim, degree)
    space = DofSpace.create(mesh)
    A = np.arange(dim * dim).reshape(dim, dim) * 0.01
    u = mesh.nodes @ A.T  # u_i = A_ij x_j -> grad u = A
    eps = compute_nodal_strain(space, u)
    expected = 0.5 * (A + A.T)
    np.testing.assert_allclose(
        eps, np.broadcast_to(expected, eps.shape), atol=1e-12
    )


def test_write_vtu_roundtrip(tmp_path):
    mesh = subdivided_hyper_rectangle((2, 1), [0, 0], [2.0, 1.0], degree=2)
    space = DofSpace.create(mesh)
    u = 0.1 * mesh.nodes  # uniform strain 0.1*I, displaced geometry 1.1*X
    path = write_vtu(str(tmp_path / "out.vtu"), space, u)
    piece, arrays = _read_vtu(path)
    n_cells, npc = space.cells.shape
    assert int(piece.attrib["NumberOfCells"]) == n_cells
    assert int(piece.attrib["NumberOfPoints"]) == n_cells * npc

    pts = arrays["Points"].reshape(-1, 3)
    conn = arrays["connectivity"]
    # displaced (Eulerian) geometry: x = 1.1 X
    lex_pts = mesh.nodes[space.cells].reshape(-1, 2) * 1.1
    np.testing.assert_allclose(pts[:, :2], lex_pts, atol=1e-12)
    # connectivity refers into the right patch and covers all points
    assert conn.min() == 0 and conn.max() == n_cells * npc - 1
    assert len(set(conn.tolist())) == n_cells * npc
    # cell types
    assert np.all(arrays["types"] == 70)
    # strain_xx == 0.1 everywhere, strain_xy == 0
    np.testing.assert_allclose(arrays["strain_xx"], 0.1, atol=1e-12)
    np.testing.assert_allclose(arrays["strain_xy"], 0.0, atol=1e-12)
    # displacement vector padded to 3 components
    disp = arrays["displacement"].reshape(-1, 3)
    assert np.all(disp[:, 2] == 0)


def test_vtu_corner_positions_follow_vtk_order(tmp_path):
    """First 4 connectivity entries of a quad cell must point at the CCW
    corners (VTK Lagrange layout)."""
    mesh = subdivided_hyper_rectangle((1, 1), [0, 0], [1.0, 1.0], degree=3)
    space = DofSpace.create(mesh)
    path = write_vtu(
        str(tmp_path / "c.vtu"), space, np.zeros((space.n_nodes, 2))
    )
    _, arrays = _read_vtu(path)
    pts = arrays["Points"].reshape(-1, 3)[:, :2]
    conn = arrays["connectivity"]
    corners = pts[conn[:4]]
    np.testing.assert_allclose(
        corners, [[0, 0], [1, 0], [1, 1], [0, 1]], atol=1e-12
    )


def test_timer_sections():
    t = TimerOutput()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    assert t.sections["a"][1] == 2
    assert t.sections["b"][1] == 1
    s = t.summary()
    assert "a" in s and "b" in s and "Total wallclock" in s
