import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace, build_transpose_gather_plan
from dealii_adapter_tpu.mesh.generator import (
    LINEAR_IDS,
    NONLINEAR_IDS,
    make_scenario_grid,
    subdivided_hyper_rectangle,
)


def test_mesh_counts_2d():
    m = subdivided_hyper_rectangle((3, 2), (0, 0), (3, 2), degree=1)
    assert m.n_cells == 6
    assert m.n_nodes == 4 * 3
    assert m.n_dofs == 24
    assert np.allclose(m.cell_h, [1, 1])
    # colorized boundary face counts: x faces 2*2, y faces 3*2
    assert len(m.boundary_faces[0]) == 2  # x_min
    assert len(m.boundary_faces[1]) == 2
    assert len(m.boundary_faces[2]) == 3  # y_min
    assert len(m.boundary_faces[3]) == 3


def test_mesh_counts_3d_q2():
    m = subdivided_hyper_rectangle((2, 2, 1), (0, 0, 0), (2, 2, 1), degree=2)
    assert m.n_cells == 4
    assert m.n_nodes == 5 * 5 * 3
    assert m.cells.shape == (4, 27)
    assert len(m.boundary_faces[4]) == 4  # z_min
    assert len(m.boundary_faces[5]) == 4


def test_node_coordinates_gll_spacing():
    m = subdivided_hyper_rectangle((2, 1), (0, 0), (2, 1), degree=3)
    ax = m.axis_coords[0]
    assert len(ax) == 2 * 3 + 1
    # first cell nodes are GLL points of [0,1]
    from dealii_adapter_tpu.fem.tabulation import gauss_lobatto_points

    assert np.allclose(ax[:4], gauss_lobatto_points(3))
    assert np.allclose(ax[3:], 1.0 + gauss_lobatto_points(3))


def test_connectivity_consistency():
    m = subdivided_hyper_rectangle((3, 2), (0, 0), (1, 1), degree=2)
    from dealii_adapter_tpu.fem.tabulation import tabulate

    tab = tabulate(2, 2, 3)
    # the coordinates of local nodes must match the affine map of ref nodes
    for c in range(m.n_cells):
        xy = m.nodes[m.cells[c]]
        origin = xy[0]
        ref = tab.nodes * m.cell_h + origin
        assert np.allclose(xy, ref, atol=1e-12)


def test_shared_nodes_between_neighbor_cells():
    m = subdivided_hyper_rectangle((2, 1), (0, 0), (2, 1), degree=1)
    # cells 0 and 1 share the x=1 edge: local nodes (1,3) of cell 0 == (0,2) of cell 1
    assert m.cells[0][1] == m.cells[1][0]
    assert m.cells[0][3] == m.cells[1][2]


@pytest.mark.parametrize("dim", [2, 3])
def test_scenario_fsi3_geometry(dim):
    mesh, tags = make_scenario_grid("FSI3", dim, degree=1, solver="linear")
    assert {k: tags[k] for k in LINEAR_IDS} == LINEAR_IDS
    assert mesh.reps[:2] == (18, 3)
    assert np.allclose(mesh.p0[:2], [0.24899, 0.19])
    assert np.allclose(mesh.p1[:2], [0.6, 0.21])
    # interface = y_min + y_max + x_max = 18 + 18 + 3 faces per z-layer
    n_layer = 1
    assert len(mesh.boundary_faces[tags["interface"]]) == (18 + 18 + 3) * n_layer
    assert len(mesh.boundary_faces[tags["clamped"]]) == 3 * n_layer
    if dim == 3:
        assert len(mesh.boundary_faces[tags["out_of_plane"]]) == 2 * 18 * 3


def test_scenario_pf_geometry():
    mesh, tags = make_scenario_grid(
        "PF", 2, degree=1, flap_location=0.0, solver="neo-Hookean"
    )
    assert {k: tags[k] for k in NONLINEAR_IDS} == NONLINEAR_IDS
    assert mesh.reps == (3, 18)
    assert np.allclose(mesh.p0, [-0.05, 0.0])
    assert np.allclose(mesh.p1, [0.05, 1.0])
    # interface: x_min + x_max + y_max = 18 + 18 + 3; clamped y_min = 3
    assert len(mesh.boundary_faces[tags["interface"]]) == 39
    assert len(mesh.boundary_faces[tags["clamped"]]) == 3


def test_scenario_refinement_scaling():
    m0, _ = make_scenario_grid("PF", 2, degree=1, refine=0)
    m2, _ = make_scenario_grid("PF", 2, degree=1, refine=2)
    assert m2.n_cells == m0.n_cells * 16


def test_transpose_gather_plan_matches_scatter_add():
    rng = np.random.default_rng(0)
    m = subdivided_hyper_rectangle((3, 2), (0, 0), (1, 1), degree=2)
    plan, sentinel = build_transpose_gather_plan(m.cells, m.n_nodes)
    vals = rng.normal(size=(m.n_cells, m.cells.shape[1], 2))
    flat = np.concatenate([vals.reshape(-1, 2), np.zeros((1, 2))], axis=0)
    via_plan = flat[plan].sum(axis=1)
    ref = np.zeros((m.n_nodes, 2))
    np.add.at(ref, m.cells.ravel(), vals.reshape(-1, 2))
    assert np.allclose(via_plan, ref, atol=1e-13)


def test_dofspace_boundary_nodes_and_mask():
    mesh, tags = make_scenario_grid("PF", 2, degree=2, solver="linear")
    ds = DofSpace.create(mesh)
    # clamped boundary: y = 0 line, 3 cells * degree 2 + 1 = 7 nodes
    clamped = ds.boundary_nodes[tags["clamped"]]
    assert len(clamped) == 7
    assert np.allclose(ds.mesh.nodes[clamped][:, 1], 0.0)
    # interface nodes: all nodes with x=+-0.05 or y=1, excluding... corners on
    # y=0 shared with x faces ARE interface nodes (they sit on interface faces)
    coords = ds.boundary_node_coords(tags["interface"])
    on_if = (
        np.isclose(coords[:, 0], -0.05)
        | np.isclose(coords[:, 0], 0.05)
        | np.isclose(coords[:, 1], 1.0)
    )
    assert on_if.all()
    mask = ds.dirichlet_mask(tags["clamped"])
    assert mask.shape == (ds.n_nodes, 2)
    assert np.all(mask[clamped] == 0)
    assert mask.sum() == (ds.n_nodes - 7) * 2


def test_dofspace_3d_out_of_plane_mask():
    mesh, tags = make_scenario_grid("FSI3", 3, degree=1, solver="linear")
    ds = DofSpace.create(mesh)
    mask = ds.dirichlet_mask(tags["clamped"], tags["out_of_plane"])
    znodes = ds.boundary_nodes[tags["out_of_plane"]]
    clamped = ds.boundary_nodes[tags["clamped"]]
    only_z = np.setdiff1d(znodes, clamped)
    assert np.all(mask[only_z, 2] == 0)
    assert np.all(mask[only_z, 0] == 1)
    assert np.all(mask[clamped] == 0)


def test_interface_faces_nodes_coords():
    mesh, tags = make_scenario_grid("PF", 2, degree=3, solver="linear")
    ds = DofSpace.create(mesh)
    faces, fnodes = ds.interface_faces(tags["interface"])
    assert fnodes.shape == (39, 4)
    # every face-node coordinate lies on the interface
    c = ds.mesh.nodes[fnodes.ravel()]
    ok = (
        np.isclose(c[:, 0], -0.05)
        | np.isclose(c[:, 0], 0.05)
        | np.isclose(c[:, 1], 1.0)
    )
    assert ok.all()
