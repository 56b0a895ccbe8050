"""Closed-loop two-way FSI through the coupling protocol (VERDICT r2 #4).

Every earlier coupling test used read data that depends on *time only*;
these close the loop: the surrogate fluid's stress depends on the
displacement the solid writes (an elastic-foundation / added-mass-piston
law), so each coupling window is a genuine fixed-point problem
``u* = S(sigma0 - k u*)`` — the physics implicit coupling schemes exist
for (`adapter.h:447-489`, reference README.md:5-10).

The surrogate repeats each window until a preCICE-style *relative
convergence measure* on the exchanged displacement is met (not a fixed
iteration count), optionally with Aitken underrelaxation, and the coupled
fixed point is verified against an independent **monolithic mini-solve**:
the solid's one-window interface map is affine for the linear model,
``S(sigma) = A sigma + b``; probing A and b column-by-column and solving
``(I + k A) u* = A sigma0 + b`` directly gives the coupled answer with no
fixed-point iteration at all.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dealii_adapter_tpu.adapter import Adapter
from dealii_adapter_tpu.adapter.participant import SurrogateFluidParticipant
from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity
from dealii_adapter_tpu.runner import coupled_run


def _linear_params(**kw):
    defaults = dict(
        model="linear",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        end_time=0.01,
        poly_degree=1,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        theta=0.5,
    )
    defaults.update(kw)
    return AllParameters(**defaults)


def _interface_map(model, state0, iface):
    """Probe the affine one-window interface map S(sigma) = A sigma + b of
    the linear solid: column j of A is S(e_j) - S(0). Each probe is one
    jitted step from the same initial state — independent of the coupling
    machinery under test."""
    n_nodes, dim = model.space.n_nodes, model.space.dim
    n_if = len(iface)
    N = n_if * dim

    def S(sig_flat):
        field = np.zeros((n_nodes, dim))
        field[iface] = sig_flat.reshape(n_if, dim)
        st, _ = model.step(state0, jnp.asarray(field, dtype=model.dtype))
        return np.asarray(st.displacement)[iface].ravel()

    b = S(np.zeros(N))
    A = np.empty((N, N))
    # probe at a physically-sized stress (not 1 Pa): the linear solve meets
    # an ABSOLUTE residual contract (1e-10, `linear_elasticity.cc:542-543`),
    # so unit probes would carry that error at ~1e-4 of the column scale
    probe = 1.0e3
    for j in range(N):
        e = np.zeros(N)
        e[j] = probe
        A[:, j] = (S(e) - b) / probe
    return A, b


def _coupled_setup(params, k, sigma0_x, acceleration="aitken", eps=1e-10,
                   initial_relaxation=0.5):
    model = LinearElastodynamics(params)
    iface = np.asarray(model.space.boundary_nodes[model.interface_id])

    def stress_fn(t, coords, u):
        sig = np.zeros_like(u)
        sig[:, 0] = sigma0_x
        return sig - k * u

    fluid = SurrogateFluidParticipant(
        dim=params.dim,
        window_dt=params.delta_t,
        end_time=params.end_time,
        stress_fn=stress_fn,
        eps=eps,
        acceleration=acceleration,
        initial_relaxation=initial_relaxation,
    )
    adapter = Adapter(
        params, model.interface_id, model.space, participant=fluid,
        dtype=model.dtype,
    )
    return model, adapter, fluid, iface


class TestClosedLoopFSI:
    """Shared expensive fixture: the probed monolithic interface map."""

    @pytest.fixture(scope="class")
    def mono(self):
        params = _linear_params()
        model = LinearElastodynamics(params)
        iface = np.asarray(model.space.boundary_nodes[model.interface_id])
        A, b = _interface_map(model, model.initial_state(), iface)
        # coupling stiffness chosen from the measured compliance so the
        # unrelaxed fixed-point map has spectral radius ~2 — divergent
        # without under-relaxation, i.e. the regime implicit coupling
        # acceleration exists for (added-mass instability)
        k = 2.0 / np.linalg.norm(A, 2)
        return params, A, b, k, iface

    def test_monolithic_fixed_point_matches_coupled_run(self, mono):
        params, A, b, k, iface = mono
        sigma0_x = 1000.0
        N = A.shape[0]
        sig0 = np.zeros(N)
        sig0[0::2] = sigma0_x
        u_mono = np.linalg.solve(np.eye(N) + k * A, A @ sig0 + b)

        model, adapter, fluid, iface2 = _coupled_setup(params, k, sigma0_x)
        np.testing.assert_array_equal(iface, iface2)
        state = coupled_run(model, adapter)
        u_coupled = np.asarray(state.displacement)[iface].ravel()

        scale = np.linalg.norm(u_mono)
        assert scale > 0
        # coupled fixed point == monolithic solve to the coupling tolerance
        assert np.linalg.norm(u_coupled - u_mono) <= 50 * 1e-10 * scale
        # and the coupling genuinely moved the answer: the uncoupled
        # (k = 0) response differs at the percent level
        u_uncoupled = A @ sig0 + b
        assert np.linalg.norm(u_uncoupled - u_mono) > 1e-3 * scale

    def test_iterations_are_convergence_determined(self, mono):
        params, A, b, k, iface = mono
        params5 = _linear_params(end_time=0.05)
        model, adapter, fluid, _ = _coupled_setup(params5, k, 1000.0)
        coupled_run(model, adapter)
        counts = fluid.iterations_per_window
        assert len(counts) == 5
        # convergence-driven: multiple implicit iterations, and the count
        # VARIES across windows (fixed-k schedules can't produce this)
        assert max(counts) >= 3
        assert len(set(counts)) > 1, counts
        # later windows start from the previous converged estimate and
        # need fewer iterations than the cold first window
        assert counts[-1] < counts[0], counts

    def test_aitken_beats_constant_relaxation(self, mono):
        params, A, b, k, iface = mono
        params3 = _linear_params(end_time=0.03)
        total = {}
        for accel in ("aitken", "constant"):
            # eps=1e-8: constant omega=0.25 contracts at ~0.75/iteration,
            # so 1e-10 would need ~80 its; 1e-8 keeps both schemes inside
            # max_iterations while still a stringent measure
            model, adapter, fluid, _ = _coupled_setup(
                params3, k, 1000.0, acceleration=accel,
                initial_relaxation=0.25, eps=1e-8,
            )
            coupled_run(model, adapter)
            total[accel] = sum(fluid.iterations_per_window)
        assert total["aitken"] < total["constant"], total

    def test_divergence_without_relaxation_is_detected(self, mono):
        """omega = 1 (no relaxation) on a spectral-radius-2 loop diverges;
        the participant reports it instead of looping forever."""
        params, A, b, k, iface = mono
        model, adapter, fluid, _ = _coupled_setup(
            params, k, 1000.0, acceleration="constant",
            initial_relaxation=1.0,
        )
        fluid.max_iterations = 25
        with pytest.raises(RuntimeError, match="did not converge"):
            coupled_run(model, adapter)


def test_closed_loop_nonlinear_solid():
    """The same displacement-dependent fluid law around the finite-strain
    Neo-Hookean solid: implicit iterations must converge and the fixed
    point must satisfy u* = S(sigma(u*)) when re-checked with one extra
    solid solve (no affine structure to exploit for the nonlinear model)."""
    params = AllParameters(
        model="neo-Hookean",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        end_time=0.01,
        poly_degree=1,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        tol_u=1e-9,
        tol_f=1e-11,
    )
    model = NonlinearElasticity(params)
    iface = np.asarray(model.space.boundary_nodes[model.interface_id])
    k = 2.0e7
    sigma0_x = 2000.0

    def stress_fn(t, coords, u):
        sig = np.zeros_like(u)
        sig[:, 0] = sigma0_x
        return sig - k * u

    # eps=1e-6: the coupling residual floors at the Newton solve's own
    # noise (tol_u=1e-9 relative on a ~1e-4 displacement -> ~5e-8 rel
    # fixed-point residual measured); the coupling measure must sit above
    # the inner solver's floor, as in real preCICE configs
    fluid = SurrogateFluidParticipant(
        dim=2, window_dt=0.01, end_time=0.01, stress_fn=stress_fn,
        eps=1e-6, acceleration="aitken",
    )
    adapter = Adapter(
        params, model.interface_id, model.space, participant=fluid,
        dtype=model.dtype,
    )
    state = coupled_run(model, adapter)
    assert fluid.iterations_per_window[0] >= 3

    # self-consistency: one more solid solve from the window's initial
    # state with the CONVERGED stress reproduces the converged displacement
    u_star = np.asarray(state.displacement)[iface]
    field = np.zeros((model.space.n_nodes, 2))
    field[iface] = stress_fn(0.01, None, u_star)
    st2, _ = model.step(
        model.initial_state(), jnp.asarray(field, dtype=model.dtype)
    )
    u_check = np.asarray(st2.displacement)[iface]
    scale = max(np.linalg.norm(u_star), 1e-30)
    # the converged iterate satisfies the fixed point to ~eps/(1-rho)
    # relative (successive-iterate measure), so bound by a small multiple
    # of the coupling tolerance
    assert np.linalg.norm(u_check - u_star) <= 20 * fluid.eps * scale
