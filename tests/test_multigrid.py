"""Geometric multigrid preconditioner tests: h-independence, SPD
consistency with plain CG, and model integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import make_scenario_grid
from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, assemble_diagonal
from dealii_adapter_tpu.ops.structured import make_structured_operator
from dealii_adapter_tpu.solvers.cg import cg_solve, jacobi_preconditioner
from dealii_adapter_tpu.solvers.multigrid import GeometricMultigrid

MU, NU, RHO = 0.5e6, 0.4, 1000.0
LMBDA = 2 * MU * NU / (1 - 2 * NU)
C = (0.5 * 0.01) ** 2  # (theta dt)^2


def _setup(degree, scale, dim=2, **mg_kw):
    mesh, tags = make_scenario_grid("PF", dim, degree, scale=scale, solver="linear")
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    A_e = C * elem.K_e + elem.M_e
    A_raw = make_structured_operator(space, A_e)
    mask = jnp.asarray(space.dirichlet_mask(tags["clamped"], tags.get("out_of_plane")))

    def A(v):
        return mask * A_raw(mask * v) + (1 - mask) * v

    diag = mask * jnp.asarray(assemble_diagonal(space, A_e)) + (1 - mask)
    mg = GeometricMultigrid(
        mesh, tags, A, diag, mask, C * LMBDA, C * MU, mass_coeff=RHO, **mg_kw
    )
    return space, A, diag, mask, mg


def _solve_its(A, b, precond):
    r = cg_solve(A, b, jnp.zeros_like(b), tol=1e-10, max_iter=50000,
                 preconditioner=precond)
    assert bool(r.converged)
    return int(r.iterations), r.x


@pytest.mark.parametrize("degree", [1, 3])
def test_mg_h_independence(degree):
    """CG+MG iterations must stay ~flat under refinement (vs Jacobi's
    ~2x growth per refinement)."""
    its = []
    for scale in (2, 4):
        space, A, diag, mask, mg = _setup(degree, scale)
        b = mask * jnp.asarray(
            np.random.default_rng(0).standard_normal((space.n_nodes, 2))
        )
        n, _ = _solve_its(A, b, mg)
        its.append(n)
    assert its[1] <= its[0] + 8, its
    assert its[1] < 40, its


def test_mg_matches_jacobi_solution():
    space, A, diag, mask, mg = _setup(2, 2)
    b = mask * jnp.asarray(
        np.random.default_rng(1).standard_normal((space.n_nodes, 2))
    )
    its_j, x_j = _solve_its(A, b, jacobi_preconditioner(diag))
    its_mg, x_mg = _solve_its(A, b, mg)
    assert its_mg < its_j / 5
    np.testing.assert_allclose(
        np.asarray(x_mg), np.asarray(x_j), rtol=1e-8, atol=1e-12
    )


@pytest.mark.parametrize("fem_sem,bound", [(True, 1e-2), (False, 8e-2)])
def test_mg_vcycle_contracts(fem_sem, bound):
    """The raw V-cycle must converge as a stationary iteration (this is
    the property the boundary-id fix restored). FEM-SEM coarsening
    contracts ~0.4/cycle; the cheaper p+h coarsening ~0.55/cycle."""
    space, A, diag, mask, mg = _setup(2, 4, fem_sem=fem_sem)
    b = mask * jnp.asarray(
        np.random.default_rng(2).standard_normal((space.n_nodes, 2))
    )
    x = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm(b))
    for _ in range(6):
        x = x + mg(b - A(x))
    assert float(jnp.linalg.norm(b - A(x))) / r0 < bound


def test_mg_3d():
    space, A, diag, mask, mg = _setup(2, 1, dim=3)
    b = mask * jnp.asarray(
        np.random.default_rng(3).standard_normal((space.n_nodes, 3))
    )
    its, _ = _solve_its(A, b, mg)
    assert its < 80, its


def test_mixed_precision_mg_matches_f64():
    """f32/bf16 V-cycle inside f64 CG: same solutions, comparable counts."""
    results = {}
    for pdtype in ("", "float32", "bfloat16"):
        p = AllParameters(
            model="neo-Hookean", type_lin="CG", scenario="PF", delta_t=0.01,
            poly_degree=2, mu=MU, nu=NU, rho=RHO,
            preconditioner="MG", precond_dtype=pdtype,
        )
        m = NonlinearElasticity(p)
        s = jnp.zeros((m.space.n_nodes, 2)).at[:, 0].set(5000.0)
        st, info = m.step(m.initial_state(), s)
        assert bool(info.converged)
        results[pdtype] = (np.asarray(st.displacement), int(info.cg_iterations))
    np.testing.assert_allclose(
        results["float32"][0], results[""][0], rtol=1e-7, atol=1e-12
    )
    assert abs(results["float32"][1] - results[""][1]) <= 5
    # a bf16 V-cycle is a weaker but still SPD preconditioner: identical
    # converged solution (Newton verifies in f64), bounded iteration growth
    np.testing.assert_allclose(
        results["bfloat16"][0], results[""][0], rtol=1e-7, atol=1e-12
    )
    assert results["bfloat16"][1] <= 2 * results[""][1]


def test_nonlinear_model_with_mg():
    p = AllParameters(
        model="neo-Hookean", type_lin="CG", scenario="PF", delta_t=0.01,
        poly_degree=2, mu=MU, nu=NU, rho=RHO, preconditioner="MG",
    )
    m = NonlinearElasticity(p)
    s = jnp.zeros((m.space.n_nodes, 2)).at[:, 0].set(5000.0)
    st, info = m.step(m.initial_state(), s)
    assert bool(info.converged)
    # Jacobi comparison: MG must cut total CG iterations dramatically
    p2 = AllParameters(
        model="neo-Hookean", type_lin="CG", scenario="PF", delta_t=0.01,
        poly_degree=2, mu=MU, nu=NU, rho=RHO, preconditioner="Jacobi",
    )
    m2 = NonlinearElasticity(p2)
    st2, info2 = m2.step(m2.initial_state(), s)
    assert int(info.cg_iterations) < int(info2.cg_iterations) / 4
    np.testing.assert_allclose(
        np.asarray(st.displacement), np.asarray(st2.displacement),
        rtol=1e-7, atol=1e-12,
    )


def test_geometry_skeleton_reuse_across_mass_coeff():
    """`with_delta_t` clones share the dt-independent geometry skeleton
    cached on the mesh (level meshes, transfers, K/M splits); a hierarchy
    rebuilt with a different mass_coeff through the cache must equal one
    built on a pristine mesh with no cache."""
    import copy

    space, A, diag, mask, mg1 = _setup(2, 2)
    mesh = space.mesh
    assert len(mesh._mg_geom_cache) == 1
    # second build on the same mesh, different mass coefficient (new dt):
    # reuses the skeleton (cache size stays 1)
    mesh2, tags = make_scenario_grid("PF", 2, 2, scale=2, solver="linear")
    elem = ElementMatrices(space, LMBDA, MU, RHO)
    A_e = 4 * C * elem.K_e + elem.M_e
    A_raw = make_structured_operator(space, A_e)

    def A2(v):
        return mask * A_raw(mask * v) + (1 - mask) * v

    diag2 = mask * jnp.asarray(assemble_diagonal(space, A_e)) + (1 - mask)
    mg_cached = GeometricMultigrid(
        mesh, tags, A2, diag2, mask, 4 * C * LMBDA, 4 * C * MU,
        mass_coeff=RHO,
    )
    assert len(mesh._mg_geom_cache) == 1  # skeleton shared, not regrown
    # ... and equals a build with no cache available
    mg_fresh = GeometricMultigrid(
        mesh2, tags, A2, diag2, mask, 4 * C * LMBDA, 4 * C * MU,
        mass_coeff=RHO,
    )
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((space.n_nodes, space.dim)))
    np.testing.assert_allclose(
        np.asarray(mg_cached(r)), np.asarray(mg_fresh(r)), rtol=1e-12,
        atol=1e-14,
    )
    # dt-dependence is real: the two-dt hierarchies differ
    assert not np.allclose(np.asarray(mg_cached(r)), np.asarray(mg1(r)))


def test_vmem_backend_matches_default_hierarchy():
    """mg_level_backend='stencil_vmem' (whole-field-in-VMEM Pallas level
    operators; interpret mode off-TPU) builds the same V-cycle as the
    default stencil backend to solver accuracy (3D, so the vmem kernel is
    actually exercised rather than falling back to shift)."""
    space, A, diag, mask, mg_ref = _setup(
        2, 1, dim=3, level_backend="stencil"
    )
    _, _, _, _, mg_vmem = _setup(2, 1, dim=3, level_backend="stencil_vmem")
    r = mask * jnp.asarray(
        np.random.default_rng(5).standard_normal((space.n_nodes, 3))
    )
    z_ref = np.asarray(mg_ref(r))
    z_vmem = np.asarray(mg_vmem(r))
    np.testing.assert_allclose(
        z_vmem, z_ref, rtol=0, atol=1e-11 * np.abs(z_ref).max()
    )


def test_unknown_level_backend_rejected():
    """A typo'd mg_level_backend must raise, not silently fall through to
    the slowest per-cell XLA formulation."""
    with pytest.raises(ValueError, match="mg_level_backend"):
        _setup(1, 1, level_backend="stencilflat")


def test_autotune_q1_backend_picks_valid_and_caches():
    """`mg_level_backend="auto"` on TPU measures candidates at the real
    level shape and keeps the fastest; the result is process-cached per
    (shape, dtype). Exercised here directly on CPU (no Pallas candidate)."""
    from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
    from dealii_adapter_tpu.solvers import multigrid as mgmod

    mesh = subdivided_hyper_rectangle(
        (4, 6, 2), (0.0, 0.0, 0.0), (0.1, 1.0, 0.3), 1
    )
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 1.5e6, 0.5e6, 1000.0)
    E = elem.K_e + 1e4 * elem.M_e

    mgmod._AUTOTUNE_CACHE.clear()
    winner = mgmod._autotune_q1_backend(space, E, jnp.float32, use_pallas=False)
    assert winner in (
        "stencil", "stencil_conv", "stencil_banded", "stencil_flat",
        "stencil_flatx", "stencil_vmem",
    )
    key = ("float32", False)
    assert mgmod._AUTOTUNE_CACHE[key] == (winner, space.n_nodes)
    # cache hit path returns without re-measuring (same or smaller shape)
    mgmod._AUTOTUNE_CACHE[key] = ("stencil_flat", space.n_nodes)
    assert (
        mgmod._autotune_q1_backend(space, E, jnp.float32, use_pallas=False)
        == "stencil_flat"
    )
    # a strictly larger level than the measured one re-tunes
    mgmod._AUTOTUNE_CACHE[key] = ("stencil_flat", space.n_nodes - 1)
    rewinner = mgmod._autotune_q1_backend(
        space, E, jnp.float32, use_pallas=False
    )
    assert mgmod._AUTOTUNE_CACHE[key] == (rewinner, space.n_nodes)
    mgmod._AUTOTUNE_CACHE.clear()
