"""Structured (gather-free) element backend vs the transpose-gather path."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, make_operator
from dealii_adapter_tpu.ops.structured import (
    extract_cell_patches,
    make_structured_operator,
    overlap_add,
)


@pytest.mark.parametrize(
    "dim,degree,reps",
    [(2, 1, (4, 3)), (2, 3, (5, 4)), (3, 1, (3, 4, 2)), (3, 2, (4, 3, 2))],
)
def test_structured_matvec_matches_gather(dim, degree, reps):
    mesh = subdivided_hyper_rectangle(reps, [0] * dim, [1.0] * dim, degree)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 1.2e6, 0.5e6, 1000.0)
    op_g = make_operator(space, elem.K_e)
    op_s = make_structured_operator(space, elem.K_e)
    u = jnp.asarray(
        np.random.default_rng(0).standard_normal((space.n_nodes, dim))
    )
    np.testing.assert_allclose(
        np.asarray(op_s(u)), np.asarray(op_g(u)), rtol=1e-12, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(op_s.diagonal()),
        np.asarray(op_g.diagonal()),
        rtol=1e-12,
        atol=1e-8,
    )


def test_patch_extract_overlap_add_adjoint():
    """<extract(u), r> == <u, overlap_add(r)> — exact adjointness."""
    mesh = subdivided_hyper_rectangle((3, 2), [0, 0], [1, 1], degree=2)
    space = DofSpace.create(mesh)
    p = 2
    reps_rev = (2, 3)
    grid_shape = (5, 7)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(grid_shape + (2,)))
    r = jnp.asarray(rng.standard_normal((6, 9, 2)))
    lhs = jnp.sum(extract_cell_patches(u, p, reps_rev) * r)
    rhs = jnp.sum(u * overlap_add(r, p, reps_rev, grid_shape))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def _params(model, backend):
    return AllParameters(
        model=model,
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        poly_degree=2,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        element_backend=backend,
    )


def test_linear_model_backends_agree():
    stressor = None
    results = {}
    for backend in ("gather", "structured"):
        m = LinearElastodynamics(_params("linear", backend))
        if stressor is None:
            stressor = jnp.zeros((m.space.n_nodes, 2)).at[:, 0].set(1000.0)
        st, info = m.step(m.initial_state(), stressor)
        results[backend] = (np.asarray(st.displacement), int(info.iterations))
    np.testing.assert_allclose(
        results["structured"][0], results["gather"][0], rtol=1e-9, atol=1e-14
    )
    assert abs(results["structured"][1] - results["gather"][1]) <= 2


def test_nonlinear_model_backends_agree():
    results = {}
    for backend in ("gather", "structured"):
        m = NonlinearElasticity(_params("neo-Hookean", backend))
        s = jnp.zeros((m.space.n_nodes, 2)).at[:, 0].set(5000.0)
        st, info = m.step(m.initial_state(), s)
        assert bool(info.converged)
        results[backend] = (np.asarray(st.displacement), int(info.iterations))
    np.testing.assert_allclose(
        results["structured"][0], results["gather"][0], rtol=1e-8, atol=1e-12
    )
    assert results["structured"][1] == results["gather"][1]
