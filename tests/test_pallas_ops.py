"""Pallas fused Q1 structured-operator kernel: exactness against the XLA
formulation (interpret mode on CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import ElementMatrices
from dealii_adapter_tpu.ops.pallas_structured import (
    make_pallas_q1_operator,
    make_structured_operator_auto,
)
from dealii_adapter_tpu.ops.structured import make_structured_operator


@pytest.mark.parametrize(
    "dim,reps",
    [(2, (7, 5)), (2, (40, 37)), (3, (6, 5, 4)), (3, (9, 23, 7))],
)
def test_pallas_q1_matches_xla(dim, reps):
    p0 = (0.0,) * dim
    p1 = tuple(float(r) for r in reps)
    mesh = subdivided_hyper_rectangle(reps, p0, p1, 1)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    E = elem.K_e + 3.3e4 * elem.M_e
    ref = make_structured_operator(space, E, jnp.float64)
    pal = make_pallas_q1_operator(space, E, jnp.float64, interpret=True)
    u = jax.random.normal(jax.random.PRNGKey(0), (space.n_nodes, dim))
    err = float(jnp.linalg.norm(pal(u) - ref(u)) / jnp.linalg.norm(ref(u)))
    assert err < 1e-13, err
    # assembled diagonal agrees too
    dd = np.asarray(pal.diagonal()) - np.asarray(ref.diagonal())
    assert np.abs(dd).max() < 1e-8 * np.abs(np.asarray(ref.diagonal())).max()


def test_auto_falls_back_off_tpu():
    mesh = subdivided_hyper_rectangle((4, 3), (0.0, 0.0), (4.0, 3.0), 1)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    op = make_structured_operator_auto(space, elem.K_e, jnp.float32)
    # on the CPU test platform the XLA formulation must be selected
    from dealii_adapter_tpu.ops.structured import StructuredOperator

    assert isinstance(op, StructuredOperator)


@pytest.mark.parametrize(
    "reps,slab",
    [((6, 5, 4), 2), ((9, 23, 7), 4), ((8, 4, 12), 4), ((5, 3, 3), 8)],
)
def test_pallas_q1_slab_matches_xla(reps, slab):
    """Slab kernel (B cell planes per grid step, in-plane axis swap for lane
    utilization) is exact against the XLA formulation, including lattices
    where B divides / does not divide the cell-plane count."""
    from dealii_adapter_tpu.ops.pallas_structured import (
        make_pallas_q1_slab_operator,
    )

    mesh = subdivided_hyper_rectangle(
        reps, (0.0,) * 3, tuple(float(r) for r in reps), 1
    )
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    E = elem.K_e + 3.3e4 * elem.M_e
    ref = make_structured_operator(space, E, jnp.float64)
    pal = make_pallas_q1_slab_operator(
        space, E, jnp.float64, slab=slab, interpret=True
    )
    u = jax.random.normal(jax.random.PRNGKey(0), (space.n_nodes, 3))
    err = float(jnp.linalg.norm(pal(u) - ref(u)) / jnp.linalg.norm(ref(u)))
    assert err < 1e-13, err
    dd = np.asarray(pal.diagonal()) - np.asarray(ref.diagonal())
    assert np.abs(dd).max() < 1e-8 * np.abs(np.asarray(ref.diagonal())).max()
