"""Sum-factorized cell operators (ops/sumfact.py) vs the dense-tabulation
formulation: same physics, different contraction order — must agree to
roundoff for any degree/quadrature the nonlinear model uses.

Reference physics being factorized: the QP loops of
`/root/reference/source/nonlinear_elasticity/nonlinear_elasticity.cc:873-996`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.fem.tabulation import tabulate
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.models.material import NeoHookean
from dealii_adapter_tpu.models.nonlinear_elasticity import (
    internal_force_cellwise_T,
)
from dealii_adapter_tpu.ops.element_ops import ElementMatrices
from dealii_adapter_tpu.ops.structured import (
    _cells_shape,
    _grid_shape,
    extract_cell_patches_T,
    make_structured_operator,
)
from dealii_adapter_tpu.ops.sumfact import (
    internal_force_cellwise_sumfact,
    make_sumfact_basis,
    make_sumfact_mass_operator,
)


def _setup(degree, reps=(3, 2, 2)):
    mesh = subdivided_hyper_rectangle(reps, [0.0, 0.0, 0.0], [0.3, 0.5, 1.1], degree)
    space = DofSpace.create(mesh, n_q_1d=degree + 2)
    return mesh, space


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_internal_force_matches_dense_tabulation(degree):
    mesh, space = _setup(degree)
    tab = space.tab
    h = np.asarray(mesh.cell_h)
    G = jnp.asarray(tab.dN / h[None, None, :])
    w = jnp.asarray(tab.q_weights * float(np.prod(h)))
    mat = NeoHookean(0.5e6, 0.4, 1000.0)
    sf = make_sumfact_basis(tab, h, jnp.float64)

    rng = np.random.default_rng(degree)
    # small enough that det F > 0 on every GLL sub-cell at degree 3
    u = jnp.asarray(rng.standard_normal((space.n_nodes, 3)) * 1e-3)
    ut = extract_cell_patches_T(
        u.reshape(_grid_shape(space) + (3,)), degree, _cells_shape(space)
    )
    rt_ref, J_ref = internal_force_cellwise_T(ut, G, w, mat)
    rt_sf, J_sf = internal_force_cellwise_sumfact(ut, sf, mat)
    scale = float(jnp.max(jnp.abs(rt_ref)))
    assert float(jnp.max(jnp.abs(rt_sf - rt_ref))) / scale < 1e-12
    assert abs(float(J_sf) - float(J_ref)) < 1e-12


@pytest.mark.parametrize("degree", [1, 2])
def test_mass_operator_matches_element_matrix(degree):
    mesh, space = _setup(degree)
    rho = 1234.5
    elem = ElementMatrices(space, 0.0, 0.0, rho)
    M_dense = make_structured_operator(space, elem.M_e, jnp.float64)
    M_sf = make_sumfact_mass_operator(space, rho, jnp.float64)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, 3)))
    a, b = M_sf(u), M_dense(u)
    assert float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(b))) < 1e-12
