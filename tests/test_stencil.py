"""Assembled 27-point stencil Q1 operator (ops/stencil.py): exactness of
the inclusion-exclusion boundary corrections against the per-cell
structured formulation, across dimensions and anisotropic/degenerate
lattices, plus the assembled diagonal."""

import numpy as np
import pytest

import jax.numpy as jnp

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import ElementMatrices
from dealii_adapter_tpu.ops.stencil import make_q1_stencil_operator
from dealii_adapter_tpu.ops.structured import make_structured_operator


CASES = [
    (2, (3, 2)),
    (2, (1, 4)),
    (3, (3, 2, 4)),
    (3, (1, 1, 1)),  # every node is a boundary corner/edge
    (3, (2, 1, 3)),  # one-cell-thick slab (face corrections overlap)
]


def _setup(dim, reps, lmbda=1.3, mu=0.7, rho=2.1):
    p1 = tuple(0.7 * r for r in reps)  # anisotropic cell spacing
    mesh = subdivided_hyper_rectangle(reps, (0.0,) * dim, p1, 1)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, lmbda, mu, rho)
    return space, elem.K_e + elem.M_e


@pytest.mark.parametrize("dim,reps", CASES)
def test_matches_per_cell_operator(dim, reps):
    space, E = _setup(dim, reps)
    ref = make_structured_operator(space, E, jnp.float64)
    st = make_q1_stencil_operator(space, E, jnp.float64)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, dim)))
    r_ref = np.asarray(ref(u))
    r_st = np.asarray(st(u))
    np.testing.assert_allclose(r_st, r_ref, rtol=0, atol=1e-13 * np.abs(r_ref).max())


@pytest.mark.parametrize("dim,reps", CASES)
def test_diagonal_matches(dim, reps):
    space, E = _setup(dim, reps)
    ref = make_structured_operator(space, E, jnp.float64)
    st = make_q1_stencil_operator(space, E, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(st.diagonal()),
        np.asarray(ref.diagonal()),
        rtol=1e-13,
    )


def test_low_precision_io_roundtrip():
    """bf16/f32 builds compute in f32 and return the I/O dtype."""
    space, E = _setup(3, (2, 3, 2))
    st32 = make_q1_stencil_operator(space, E, jnp.float32)
    ref = make_structured_operator(space, E, jnp.float64)
    rng = np.random.default_rng(3)
    u = rng.standard_normal((space.n_nodes, 3))
    out = st32(jnp.asarray(u, dtype=jnp.float32))
    assert out.dtype == jnp.float32
    r_ref = np.asarray(ref(jnp.asarray(u)))
    np.testing.assert_allclose(
        np.asarray(out), r_ref, atol=3e-6 * np.abs(r_ref).max()
    )


@pytest.mark.parametrize("strategy", ["conv", "banded", "flat", "flatx", "vmem"])
@pytest.mark.parametrize("dim,reps", CASES)
def test_mxu_strategies_match_shift(strategy, dim, reps):
    """The conv / banded-matmul / lane-flattened / whole-field-VMEM-Pallas
    interior formulations compute the same
    contraction as the shift form (2D silently falls back to shift; vmem
    runs the Pallas kernel in interpret mode off-TPU)."""
    space, E = _setup(dim, reps)
    ref = make_structured_operator(space, E, jnp.float64)
    st = make_q1_stencil_operator(space, E, jnp.float64, strategy=strategy)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, dim)))
    r_ref = np.asarray(ref(u))
    np.testing.assert_allclose(
        np.asarray(st(u)), r_ref, rtol=0, atol=1e-12 * np.abs(r_ref).max()
    )
