"""Phase-split Q2 operator (ops/pallas_phase.py): the phase remap of the
element matrix is validated by dense assembly on CPU (fast), the full
Pallas kernel by interpret mode (slow job). On TPU the compiled kernel is
smoke-tested at build time by `make_q2_operator_auto` (zeros probe — a
lowering check, not a parity check); compiled-vs-XLA parity on real
hardware is exercised by `tools/tpu_parity_check.py` (run in each
hardware session; results recorded in PERFORMANCE.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import ElementMatrices
from dealii_adapter_tpu.ops.pallas_phase import (
    _phase_element_matrix,
    make_pallas_q2_operator,
    make_q2_operator_auto,
)
from dealii_adapter_tpu.ops.structured import make_structured_operator


def _dense_from_q2(E, reps):
    """Standard dense assembly of the (81,81) Q2 element matrix over a
    structured (CZ, CY, CX) cell lattice; node order lexicographic,
    x fastest."""
    CZ, CY, CX = reps
    nz, ny, nx = 2 * CZ + 1, 2 * CY + 1, 2 * CX + 1
    n = nz * ny * nx
    A = np.zeros((3 * n, 3 * n))
    for I in range(CZ):
        for J in range(CY):
            for K in range(CX):
                g = []
                for c in range(3):
                    for b in range(3):
                        for a in range(3):
                            node = (
                                (2 * I + c) * ny + (2 * J + b)
                            ) * nx + (2 * K + a)
                            g.extend(3 * node + d for d in range(3))
                g = np.asarray(g)
                A[np.ix_(g, g)] += E
    return A


def _dense_from_phase(Et, reps, swap):
    """Dense assembly of the (192,192) phase-remapped matrix over the
    Q1-view phase-cell lattice, mapped back to global Q2 dofs."""
    CZ, CY, CX = reps
    nz, ny, nx = 2 * CZ + 1, 2 * CY + 1, 2 * CX + 1
    # kernel axes (z, A, L) = (z, x, y) when swapped else (z, y, x)
    CA, CL = (CX, CY) if swap else (CY, CX)
    n = nz * ny * nx
    A = np.zeros((3 * n, 3 * n))
    nch = 24
    for I in range(CZ):
        for JA in range(CA):
            for KL in range(CL):
                g = np.full(8 * nch, -1, dtype=int)
                for si, (Oz, OA, OL) in enumerate(
                    (c, b, a) for c in (0, 1) for b in (0, 1) for a in (0, 1)
                ):
                    for ph in range(8):
                        pz, pA, pL = ph >> 2 & 1, ph >> 1 & 1, ph & 1
                        iz = 2 * (I + Oz) + pz
                        iA = 2 * (JA + OA) + pA
                        iL = 2 * (KL + OL) + pL
                        iy, ix = (iL, iA) if swap else (iA, iL)
                        if iz >= nz or iy >= ny or ix >= nx:
                            continue  # padded phase node: must be unused
                        node = (iz * ny + iy) * nx + ix
                        for d in range(3):
                            g[si * nch + ph * 3 + d] = 3 * node + d
                used = g >= 0
                # couplings to padded nodes must be exactly zero
                assert np.all(Et[np.ix_(~used, used)] == 0.0)
                assert np.all(Et[np.ix_(used, ~used)] == 0.0)
                A[np.ix_(g[used], g[used])] += Et[np.ix_(used, used)]
    return A


@pytest.mark.parametrize("reps,swap", [((2, 3, 2), False), ((2, 3, 2), True),
                                       ((1, 2, 3), True), ((3, 1, 2), False)])
def test_phase_element_matrix_dense_parity(reps, swap):
    """Ẽ assembled over the phase lattice equals E assembled over the Q2
    lattice — validates the slot/phase/channel index mapping exactly."""
    mesh = subdivided_hyper_rectangle(reps[::-1], (0, 0, 0),
                                      (1.3, 0.7, 1.1), 2)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 1.234e5, 0.77e5, 900.0)
    E = np.asarray(elem.K_e + 3.3 * elem.M_e, dtype=np.float64)
    Et = _phase_element_matrix(E, swap)
    A_ref = _dense_from_q2(E, reps)
    A_ph = _dense_from_phase(Et, reps, swap)
    np.testing.assert_allclose(A_ph, A_ref, rtol=0, atol=1e-9 * np.abs(E).max())


def test_auto_falls_back_off_tpu():
    mesh = subdivided_hyper_rectangle((2, 2, 2), (0, 0, 0), (1, 1, 1), 2)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    op = make_q2_operator_auto(space, np.asarray(elem.K_e), jnp.float32)
    from dealii_adapter_tpu.ops.structured import StructuredOperator

    assert isinstance(op, StructuredOperator)


def test_diagonal_matches_xla():
    mesh = subdivided_hyper_rectangle((3, 2, 2), (0, 0, 0),
                                      (1.0, 0.8, 1.2), 2)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 1.2e6, 0.5e6, 1000.0)
    E = np.asarray(elem.K_e + 2.0 * elem.M_e)
    ref = make_structured_operator(space, E, jnp.float64)
    pal = make_pallas_q2_operator(space, E, jnp.float64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(pal.diagonal()), np.asarray(ref.diagonal()),
        rtol=1e-12, atol=1e-8,
    )


@pytest.mark.slow
def test_pallas_q2_interpret_matches_xla():
    """Full kernel in interpret mode (compile-heavy: ~6.5k unrolled FMA
    terms) — exactness against the XLA formulation, both swap
    orientations."""
    import jax

    for reps in [(4, 3, 2), (2, 5, 3)]:
        mesh = subdivided_hyper_rectangle(reps, (0, 0, 0),
                                          (1.0, 0.7, 1.3), 2)
        space = DofSpace.create(mesh)
        elem = ElementMatrices(space, 1.234e5, 0.77e5, 900.0)
        E = np.asarray(elem.K_e + 3.3 * elem.M_e)
        ref = make_structured_operator(space, E, jnp.float64)
        op = make_pallas_q2_operator(space, E, jnp.float64, interpret=True)
        u = jax.random.normal(jax.random.PRNGKey(0), (space.n_nodes, 3),
                              dtype=jnp.float64)
        err = float(
            jnp.max(jnp.abs(ref(u) - op(u))) / jnp.max(jnp.abs(ref(u)))
        )
        assert err < 1e-12, err
