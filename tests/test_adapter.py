"""Coupling adapter tests: fake-participant protocol, gather/scatter
ordering, implicit-coupling checkpoint/rollback, and the full coupled run
loop — the test pyramid layer the reference lacks (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.adapter import Adapter, FakeParticipant
from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity
from dealii_adapter_tpu.runner import coupled_run
from dealii_adapter_tpu.time_handler import Time


def _linear_params(**kw):
    defaults = dict(
        model="linear",
        type_lin="CG",
        scenario="PF",
        delta_t=0.01,
        end_time=0.05,
        poly_degree=2,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        theta=0.5,
    )
    defaults.update(kw)
    return AllParameters(**defaults)


def _make(params, model_cls=LinearElastodynamics, **fake_kw):
    model = model_cls(params)
    fk = dict(
        dim=params.dim,
        window_dt=params.delta_t,
        end_time=params.end_time,
    )
    fk.update(fake_kw)
    fake = FakeParticipant(**fk)
    adapter = Adapter(
        params, model.interface_id, model.space, participant=fake, dtype=model.dtype
    )
    return model, adapter, fake


def test_vertex_registration_order_and_count():
    params = _linear_params()
    model, adapter, fake = _make(params)
    adapter.initialize(model.initial_state().displacement)
    iface = model.space.boundary_nodes[model.interface_id]
    assert fake.coords.shape == (len(iface), 2)
    # registration order == ascending node id == reference IndexSet order
    np.testing.assert_allclose(fake.coords, model.space.mesh.nodes[iface])


def test_dimension_mismatch_raises():
    params = _linear_params()
    model, adapter, fake = _make(params)
    fake.dim = 3
    with pytest.raises(ValueError, match="dimension"):
        adapter.initialize(model.initial_state().displacement)


def test_read_scatter_write_gather_roundtrip():
    params = _linear_params()
    model, adapter, fake = _make(
        params, read_fn=lambda t, xy: np.stack([xy[:, 0], 10 * xy[:, 1]], axis=1)
    )
    adapter.initialize(model.initial_state().displacement)
    field = adapter.read_data(params.delta_t)
    iface = model.space.boundary_nodes[model.interface_id]
    coords = model.space.mesh.nodes[iface]
    np.testing.assert_allclose(np.asarray(field)[iface, 0], coords[:, 0])
    np.testing.assert_allclose(np.asarray(field)[iface, 1], 10 * coords[:, 1])
    # off-interface nodes stay zero
    mask = np.ones(model.space.n_nodes, bool)
    mask[iface] = False
    assert np.all(np.asarray(field)[mask] == 0.0)
    # write gathers the same ordering back
    adapter.advance(field, params.delta_t)
    _, _, written = fake.write_history[-1]
    np.testing.assert_allclose(written[:, 0], coords[:, 0])


def test_explicit_coupled_run_linear():
    params = _linear_params(end_time=0.05)
    model, adapter, fake = _make(
        params,
        read_fn=lambda t, xy: np.stack(
            [np.full(len(xy), 1e3 * min(t, 0.02) / 0.02), np.zeros(len(xy))], axis=1
        ),
    )
    outputs = []
    state = coupled_run(
        model, adapter, output_cb=lambda s, t, i: outputs.append(t.current())
    )
    assert fake.finalized
    assert len(outputs) == 5  # every completed window
    assert outputs == pytest.approx([0.01, 0.02, 0.03, 0.04, 0.05])
    assert float(jnp.max(jnp.abs(state.displacement))) > 0
    # one write per advance = one per window in explicit mode
    assert len(fake.write_history) == 5


def test_implicit_rollback_linear():
    """3 implicit iterations per window: state must be rolled back twice per
    window and the final trajectory must equal the explicit one."""
    params = _linear_params(end_time=0.03)
    read_fn = lambda t, xy: np.stack(
        [np.full(len(xy), 1e3), np.zeros(len(xy))], axis=1
    )
    m1, a1, f1 = _make(params, read_fn=read_fn)
    s_explicit = coupled_run(m1, a1)

    m2, a2, f2 = _make(params, read_fn=read_fn, implicit_iterations=3)
    s_implicit = coupled_run(m2, a2)

    # 3 windows x 3 iterations = 9 solves/writes, but identical final state
    assert len(f2.write_history) == 9
    np.testing.assert_allclose(
        np.asarray(s_implicit.displacement),
        np.asarray(s_explicit.displacement),
        rtol=1e-12,
        atol=1e-15,
    )
    # iterations of one window all start from the same (rolled back) state
    w0 = [v for (t, it, v) in f2.write_history if abs(t - 0.0) < 1e-12]
    assert len(w0) == 3
    np.testing.assert_allclose(w0[0], w0[1])


def test_subcycling_two_steps_per_window():
    """Solver dt = window/2: two solver steps per coupling window."""
    params = _linear_params(end_time=0.04, delta_t=0.01)
    model, adapter, fake = _make(
        params,
        window_dt=0.02,
        read_fn=lambda t, xy: np.stack(
            [np.full(len(xy), 1e3), np.zeros(len(xy))], axis=1
        ),
    )
    outputs = []
    coupled_run(
        model,
        adapter,
        strict_dt=False,
        output_cb=lambda s, t, i: outputs.append(t.current()),
    )
    # 2 windows, each completed after 2 sub-steps -> output at .02 and .04
    assert outputs == pytest.approx([0.02, 0.04])
    assert len(fake.write_history) == 4  # one write per solver step


def test_strict_dt_mismatch_raises():
    params = _linear_params(delta_t=0.01)
    model, adapter, fake = _make(params, window_dt=0.015)
    with pytest.raises(RuntimeError, match="time step"):
        coupled_run(model, adapter)


def test_initial_data_written_when_required():
    params = _linear_params()
    model, adapter, fake = _make(params, requires_initial_data=True)
    adapter.initialize(model.initial_state().displacement)
    assert len(fake.write_history) == 1
    np.testing.assert_allclose(fake.write_history[0][2], 0.0)


def test_implicit_rollback_nonlinear():
    params = _linear_params(
        model="neo-Hookean",
        poly_degree=1,
        end_time=0.02,
        tol_lin=1e-8,
    )
    read_fn = lambda t, xy: np.stack(
        [np.full(len(xy), 5e3), np.zeros(len(xy))], axis=1
    )
    m1, a1, _ = _make(params, model_cls=NonlinearElasticity, read_fn=read_fn)
    s_exp = coupled_run(m1, a1)
    m2, a2, f2 = _make(
        params,
        model_cls=NonlinearElasticity,
        read_fn=read_fn,
        implicit_iterations=2,
    )
    s_imp = coupled_run(m2, a2)
    assert len(f2.write_history) == 4
    np.testing.assert_allclose(
        np.asarray(s_imp.displacement),
        np.asarray(s_exp.displacement),
        rtol=1e-10,
        atol=1e-15,
    )


def test_time_handler_rollback_roundtrip():
    t = Time(1.0, 0.01)
    for _ in range(7):
        t.increment()
    assert t.get_timestep() == 7
    t.set_absolute_time(0.05)
    assert t.get_timestep() == 5
    assert t.current() == pytest.approx(0.05)


def test_with_delta_t_identity_and_cache():
    model = LinearElastodynamics(_linear_params())
    assert model.with_delta_t(0.01) is model
    c1 = model.with_delta_t(0.005)
    c2 = model.with_delta_t(0.005)
    assert c1 is c2
    assert c1.params.delta_t == 0.005
    assert c1.mesh is model.mesh


def test_subcycling_fractional_window_matches_manual_stepping():
    """window = 1.5 dt: each window closes with a shortened 0.5 dt chunk via
    a cached per-dt stepper (`adapter.h:104-107` headroom). The coupled run
    must equal manual stepping with the same dt sequence."""
    params = _linear_params(end_time=0.03, delta_t=0.01)
    read_fn = lambda t, xy: np.stack(
        [np.full(len(xy), 1e3), np.zeros(len(xy))], axis=1
    )
    model, adapter, fake = _make(params, window_dt=0.015, read_fn=read_fn)
    outputs = []
    state = coupled_run(
        model, adapter, strict_dt=False,
        output_cb=lambda s, t, i: outputs.append(t.current()),
    )
    assert fake.finalized
    # 2 windows x (one 0.01 step + one 0.005 step) = 4 writes
    assert len(fake.write_history) == 4
    assert outputs == pytest.approx([0.015, 0.03])

    m2 = LinearElastodynamics(params)
    m_half = m2.with_delta_t(0.005)
    iface = m2.space.boundary_nodes[m2.interface_id]
    stress = np.zeros((m2.space.n_nodes, 2))
    stress[iface, 0] = 1e3
    stress = jnp.asarray(stress, dtype=m2.dtype)
    s = m2.initial_state()
    for _ in range(2):  # two windows: full chunk then half chunk
        s, _ = m2.step(s, stress)
        s, _ = m_half.step(s, stress)
    np.testing.assert_allclose(
        np.asarray(state.displacement), np.asarray(s.displacement),
        rtol=1e-9, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(state.velocity), np.asarray(s.velocity),
        rtol=1e-9, atol=1e-11,
    )


def test_implicit_rollback_with_fractional_subcycling():
    """Implicit coupling + fractional windows: rollback rewinds the clock to
    the window start via set_absolute_time mid-window; trajectory must match
    the explicit fractional run."""
    params = _linear_params(end_time=0.03, delta_t=0.01)
    read_fn = lambda t, xy: np.stack(
        [np.full(len(xy), 1e3), np.zeros(len(xy))], axis=1
    )
    m1, a1, _ = _make(params, window_dt=0.015, read_fn=read_fn)
    s_exp = coupled_run(m1, a1, strict_dt=False)
    m2, a2, f2 = _make(
        params, window_dt=0.015, read_fn=read_fn, implicit_iterations=3
    )
    s_imp = coupled_run(m2, a2, strict_dt=False)
    # 2 windows x 3 iterations x 2 chunks = 12 solves/writes
    assert len(f2.write_history) == 12
    np.testing.assert_allclose(
        np.asarray(s_imp.displacement), np.asarray(s_exp.displacement),
        rtol=1e-12, atol=1e-15,
    )


def test_subcycling_fractional_window_nonlinear():
    """The Newmark/Newton model closes a fractional window through its own
    per-dt clone (alpha-coefficients rebuilt for the short chunk)."""
    params = _linear_params(
        model="neo-Hookean", poly_degree=1, end_time=0.015, delta_t=0.01,
        tol_lin=1e-8,
    )
    read_fn = lambda t, xy: np.stack(
        [np.full(len(xy), 5e3), np.zeros(len(xy))], axis=1
    )
    model, adapter, fake = _make(
        params, model_cls=NonlinearElasticity, window_dt=0.015,
        read_fn=read_fn,
    )
    state = coupled_run(model, adapter, strict_dt=False)
    assert fake.finalized
    assert len(fake.write_history) == 2  # 0.01 chunk + 0.005 chunk
    assert float(jnp.max(jnp.abs(state.displacement))) > 0
