"""SPMD sharding tests on the 8-device virtual CPU mesh.

Verifies that the shard_map element-kernel reduction (parallel/) is
bit-consistent with the single-device transpose-gather path for the
operators and both solver models. This is the validation the driver's
`dryrun_multichip` relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import make_scenario_grid
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, make_operator
from dealii_adapter_tpu.parallel import CellPartition, make_device_mesh
from dealii_adapter_tpu.parallel.sharded_ops import ShardedOperator

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def dmesh():
    return make_device_mesh(8)


def _space(dim=2, degree=2, solver="linear"):
    mesh, tags = make_scenario_grid("PF", dim, degree, solver=solver)
    return DofSpace.create(mesh), tags


def test_partition_covers_all_cells():
    space, _ = _space()
    part = CellPartition.create(space.cells, space.n_nodes, 8)
    assert int(part.n_valid.sum()) == space.cells.shape[0]
    # every real cell appears exactly once, in order
    rebuilt = np.concatenate(
        [part.cells[d, : part.n_valid[d]] for d in range(8)], axis=0
    )
    np.testing.assert_array_equal(rebuilt, space.cells)


def test_sharded_matvec_matches_unsharded(dmesh):
    space, _ = _space(degree=3)
    elem = ElementMatrices(space, 1.2e6, 0.5e6, 1000.0)
    ref_op = make_operator(space, elem.K_e)
    part = CellPartition.create(space.cells, space.n_nodes, 8)
    sh_op = ShardedOperator(
        part=part, mesh=dmesh, E=jnp.asarray(elem.K_e), dim=space.dim
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, space.dim)))
    np.testing.assert_allclose(
        np.asarray(sh_op(u)), np.asarray(ref_op(u)), rtol=1e-12, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sh_op.diagonal()),
        np.asarray(ref_op.diagonal()),
        rtol=1e-12,
        atol=1e-12,
    )


def test_sharded_matvec_more_devices_than_cells(dmesh):
    # 6 cells over 8 devices: two empty shards
    mesh, _ = make_scenario_grid("FSI3", 2, 1, solver="linear")
    from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle

    m = subdivided_hyper_rectangle((3, 2), (0, 0), (1.0, 0.5), degree=1)
    space = DofSpace.create(m)
    elem = ElementMatrices(space, 1.0, 1.0, 1.0)
    ref_op = make_operator(space, elem.M_e)
    part = CellPartition.create(space.cells, space.n_nodes, 8)
    sh_op = ShardedOperator(
        part=part, mesh=dmesh, E=jnp.asarray(elem.M_e), dim=space.dim
    )
    u = jnp.asarray(np.random.default_rng(1).standard_normal((space.n_nodes, 2)))
    np.testing.assert_allclose(
        np.asarray(sh_op(u)), np.asarray(ref_op(u)), rtol=1e-12, atol=1e-12
    )


def test_linear_model_sharded_step_matches(dmesh):
    params = AllParameters(
        model="linear",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        poly_degree=2,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
    )
    ref = LinearElastodynamics(params)
    sh = LinearElastodynamics(params, device_mesh=dmesh)
    stress = jnp.zeros((ref.space.n_nodes, 2)).at[:, 0].set(1000.0)
    s_ref, i_ref = ref.step(ref.initial_state(), stress)
    s_sh, i_sh = sh.step(sh.initial_state(), stress)
    np.testing.assert_allclose(
        np.asarray(s_sh.displacement),
        np.asarray(s_ref.displacement),
        rtol=1e-9,
        atol=1e-14,
    )
    assert abs(int(i_sh.iterations) - int(i_ref.iterations)) <= 2


def test_nonlinear_model_sharded_step_matches(dmesh):
    params = AllParameters(
        model="neo-Hookean",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        poly_degree=1,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        tol_lin=1e-8,
    )
    ref = NonlinearElasticity(params)
    sh = NonlinearElasticity(params, device_mesh=dmesh)
    stress = jnp.zeros((ref.space.n_nodes, 2)).at[:, 0].set(5000.0)
    s_ref, i_ref = ref.step(ref.initial_state(), stress)
    s_sh, i_sh = sh.step(sh.initial_state(), stress)
    assert bool(i_ref.converged) and bool(i_sh.converged)
    assert int(i_sh.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(s_sh.displacement),
        np.asarray(s_ref.displacement),
        rtol=1e-7,
        atol=1e-12,
    )


def test_structured_operator_shards_with_halo_exchange():
    """The gather-free structured backend is GSPMD-shardable: sharding the
    z-major nodal vector over the device mesh yields the exact
    single-device action, with XLA inserting the halo exchange
    (collective-permute) for the strided patch slices. This is the
    lattice-domain-decomposition scaling path for operators and the MG
    V-cycle (the shard_map cell-partition path remains the general one)."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
    from dealii_adapter_tpu.ops.element_ops import ElementMatrices
    from dealii_adapter_tpu.ops.structured import make_structured_operator

    mesh3 = subdivided_hyper_rectangle(
        (6, 10, 31), (0.0, 0.0, 0.0), (6.0, 10.0, 31.0), 1
    )  # nz = 32 node planes -> divisible by the 8-device mesh
    space = DofSpace.create(mesh3)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    op = make_structured_operator(space, elem.K_e, jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(0), (space.n_nodes, 3))
    r_ref = op(u)

    devmesh = Mesh(np.array(jax.devices()).reshape(8), ("z",))
    sh = NamedSharding(devmesh, P("z", None))
    f = jax.jit(lambda v: op(v), in_shardings=sh, out_shardings=sh)
    r = f(jax.device_put(u, sh))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-13)
    txt = f.lower(jax.device_put(u, sh)).compile().as_text()
    assert re.search(r"collective-permute|all-gather", txt), (
        "expected halo-exchange collectives in the sharded module"
    )


def test_nonlinear_shardmap_backend_still_matches(dmesh):
    """element_backend='gather' selects the explicit shard_map cell
    partition (the non-GSPMD SPMD mode); it must stay bit-consistent."""
    params = AllParameters(
        model="neo-Hookean",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        poly_degree=1,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        tol_lin=1e-8,
        element_backend="gather",
    )
    ref = NonlinearElasticity(
        AllParameters(**{**params.__dict__, "element_backend": "gather"})
    )
    sh = NonlinearElasticity(params, device_mesh=dmesh)
    assert sh._gspmd is False and sh._part is not None
    stress = jnp.zeros((ref.space.n_nodes, 2)).at[:, 0].set(5000.0)
    s_ref, i_ref = ref.step(ref.initial_state(), stress)
    s_sh, i_sh = sh.step(sh.initial_state(), stress)
    assert bool(i_ref.converged) and bool(i_sh.converged)
    np.testing.assert_allclose(
        np.asarray(s_sh.displacement),
        np.asarray(s_ref.displacement),
        rtol=1e-7,
        atol=1e-12,
    )


def test_nonlinear_sharded_mg_production_config_matches(dmesh):
    """The production solver (MG + bf16 V-cycle + f32 Krylov + EW +
    predictor) on a device mesh must match the single-device step to CG
    tolerance with the same Newton count — the sharded replacement of the
    reference solve seam (`linear_elasticity.cc:536-555`) at scale."""
    kw = dict(
        model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
        poly_degree=1, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
        tol_lin=1e-6, tol_u=1e-6, tol_f=1e-8, max_iterations_NR=8,
        preconditioner="MG", precond_dtype="bfloat16",
        solve_dtype="float32", newton_forcing="ew", newton_predictor=True,
        mg_smooth_degree=3,
    )
    ref = NonlinearElasticity(AllParameters(**kw))
    sh = NonlinearElasticity(AllParameters(**kw), device_mesh=dmesh)
    assert sh._gspmd is True
    stress = np.zeros((ref.space.n_nodes, 3))
    stress[ref.space.boundary_nodes[ref.interface_id], 0] = 1000.0
    stress = jnp.asarray(stress)
    s_ref, i_ref = ref.step(ref.initial_state(), stress)
    s_sh, i_sh = sh.step(sh.initial_state(), stress)
    assert bool(i_ref.converged) and bool(i_sh.converged)
    assert int(i_sh.iterations) == int(i_ref.iterations)
    scale = np.abs(np.asarray(s_ref.displacement)).max()
    np.testing.assert_allclose(
        np.asarray(s_sh.displacement),
        np.asarray(s_ref.displacement),
        rtol=0, atol=1e-8 * max(scale, 1e-6),
    )


def test_linear_sharded_mg_matches(dmesh):
    params = AllParameters(
        model="linear", type_lin="CG", scenario="PF", dim=2, poly_degree=2,
        delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0, preconditioner="MG",
    )
    ref = LinearElastodynamics(params)
    sh = LinearElastodynamics(params, device_mesh=dmesh)
    st = jnp.zeros((ref.space.n_nodes, 2)).at[:, 0].set(1000.0)
    s_ref, i_ref = ref.step(ref.initial_state(), st)
    s_sh, i_sh = sh.step(sh.initial_state(), st)
    assert abs(int(i_sh.iterations) - int(i_ref.iterations)) <= 2
    np.testing.assert_allclose(
        np.asarray(s_sh.displacement),
        np.asarray(s_ref.displacement),
        rtol=1e-9, atol=1e-14,
    )


def test_gspmd_step_contains_collectives(dmesh):
    """The GSPMD-sharded step must actually partition the lattice (halo
    exchanges / gathers in the compiled module), not silently replicate."""
    import re

    kw = dict(
        model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
        poly_degree=1, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
        tol_lin=1e-6, preconditioner="MG", mg_smooth_degree=2,
    )
    sh = NonlinearElasticity(AllParameters(**kw), device_mesh=dmesh)
    stress = jnp.zeros((sh.space.n_nodes, 3))
    state = sh.initial_state()
    txt = jax.jit(sh.jittable_step()).lower(state, stress).compile().as_text()
    assert re.search(r"collective-permute|all-gather|all-reduce", txt)
