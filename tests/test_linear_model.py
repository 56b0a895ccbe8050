"""Integration tests of the theta-scheme linear elastodynamics solver:
CG-vs-Direct agreement, energy behavior of the midpoint rule, static limit,
and exact agreement with an independent dense-matrix implementation of the
reference's update equations."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, assemble_dense


def make_solver(**kw):
    defaults = dict(
        scenario="PF",
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        poly_degree=2,
        delta_t=0.01,
        end_time=0.1,
        theta=0.5,
        type_lin="CG",
        max_iterations_lin=10.0,
        dim=2,
    )
    defaults.update(kw)
    params = AllParameters(**defaults)
    return LinearElastodynamics(params)


def uniform_traction(solver, t):
    """Nodal stress field: constant traction vector on interface nodes."""
    s = np.zeros((solver.space.n_nodes, solver.params.dim))
    s[solver.space.boundary_nodes[solver.interface_id]] = t
    return jnp.asarray(s)


def test_cg_and_direct_agree():
    cg = make_solver(type_lin="CG", poly_degree=1)
    dr = make_solver(type_lin="Direct", poly_degree=1)
    tr = uniform_traction(cg, [100.0, 0.0])
    s_cg, s_dr = cg.initial_state(), dr.initial_state()
    for _ in range(3):
        s_cg, info = cg.step(s_cg, tr)
        s_dr, _ = dr.step(s_dr, tr)
    assert int(info.iterations) > 0
    assert np.allclose(
        np.asarray(s_cg.displacement), np.asarray(s_dr.displacement), atol=1e-9
    )


def test_matches_independent_dense_theta_scheme():
    """Re-derive the reference's theta update (`linear_elasticity.cc:398-420,
    583-585`) with raw dense numpy algebra and check the solver reproduces it
    bit-for-bit to solver tolerance."""
    solver = make_solver(type_lin="Direct", poly_degree=1, delta_t=0.004)
    p = solver.params
    dt, th = p.delta_t, p.theta
    space = solver.space
    elem = ElementMatrices(space, p.lmbda, p.mu, p.rho)
    K = assemble_dense(space, elem.K_e)
    M = assemble_dense(space, elem.M_e)
    mask = np.asarray(solver.mask).reshape(-1)
    A = M + (th * dt) ** 2 * K
    Ab = A * mask[:, None] * mask[None, :]
    np.fill_diagonal(Ab, np.diag(Ab) + (1 - mask))

    tr = uniform_traction(solver, [250.0, 40.0])
    F_new = np.asarray(solver.face_load(tr)).reshape(-1)

    d = np.zeros(space.n_dofs)
    v = np.zeros(space.n_dofs)
    F_old = np.zeros(space.n_dofs)
    state = solver.initial_state()
    for _ in range(4):
        rhs = (
            dt * th * F_new
            + dt * (1 - th) * F_old
            + M @ v
            - th * (1 - th) * dt * dt * (K @ v)
            - dt * (K @ d)
        )
        rhs = rhs * mask
        v_new = np.linalg.solve(Ab, rhs)
        d = d + dt * th * v_new + dt * (1 - th) * v
        v = v_new
        F_old = F_new.copy()
        state, _ = solver.step(state, tr)
        assert np.allclose(np.asarray(state.velocity).reshape(-1), v, atol=1e-10)
        assert np.allclose(np.asarray(state.displacement).reshape(-1), d, atol=1e-10)


def test_midpoint_energy_conservation_free_vibration():
    """theta = 1/2 (trapezoidal) conserves the discrete energy
    E = 1/2 v'Mv + 1/2 d'Kd exactly for unforced linear dynamics."""
    solver = make_solver(type_lin="Direct", poly_degree=1, delta_t=0.002)
    space = solver.space
    p = solver.params
    elem = ElementMatrices(space, p.lmbda, p.mu, p.rho)
    K = assemble_dense(space, elem.K_e)
    M = assemble_dense(space, elem.M_e)
    mask = np.asarray(solver.mask).reshape(-1)

    # start from a deformed state (a few forced steps), then free vibration
    tr = uniform_traction(solver, [5000.0, 0.0])
    state = solver.initial_state()
    for _ in range(5):
        state, _ = solver.step(state, tr)
    zero = jnp.zeros_like(tr)
    # one step with zero load transitions F_old -> 0; energy measured after
    state, _ = solver.step(state, zero)

    def energy(s):
        d = np.asarray(s.displacement).reshape(-1) * mask
        v = np.asarray(s.velocity).reshape(-1) * mask
        return 0.5 * v @ (M @ v) + 0.5 * d @ (K @ d)

    e0 = energy(state)
    for _ in range(20):
        state, _ = solver.step(state, zero)
    e1 = energy(state)
    assert abs(e1 - e0) < 1e-8 * e0


def test_static_limit_matches_dense_equilibrium():
    """Long-time theta=1 (dissipative) stepping under constant traction must
    approach the static solution K d = F."""
    solver = make_solver(type_lin="Direct", poly_degree=1, theta=1.0, delta_t=0.05)
    space = solver.space
    p = solver.params
    elem = ElementMatrices(space, p.lmbda, p.mu, p.rho)
    K = assemble_dense(space, elem.K_e)
    mask = np.asarray(solver.mask).reshape(-1)
    Kb = K * mask[:, None] * mask[None, :]
    np.fill_diagonal(Kb, np.diag(Kb) + (1 - mask))

    tr = uniform_traction(solver, [300.0, 0.0])
    F = np.asarray(solver.face_load(tr)).reshape(-1) * mask
    d_static = np.linalg.solve(Kb, F)

    state = solver.initial_state()
    for _ in range(400):
        state, _ = solver.step(state, tr)
    d = np.asarray(state.displacement).reshape(-1)
    ref = np.max(np.abs(d_static))
    assert np.max(np.abs(d - d_static)) < 2e-3 * ref


def test_conservative_load_path():
    """data_consistent=False: the interface data is used directly as the
    nodal force vector (`linear_elasticity.cc:388`)."""
    solver = make_solver(type_lin="Direct", poly_degree=1, read_data_name="Force")
    assert not solver.params.data_consistent
    f = np.zeros((solver.space.n_nodes, 2))
    f[solver.space.boundary_nodes[solver.interface_id], 0] = 1.0
    state, _ = solver.step(solver.initial_state(), jnp.asarray(f))
    assert float(jnp.max(jnp.abs(state.displacement))) > 0
    # F_new recorded as old_load must equal the raw input (no body force)
    assert np.allclose(np.asarray(state.old_load), f)


def test_dirichlet_dofs_stay_zero():
    solver = make_solver(type_lin="CG", poly_degree=2)
    tr = uniform_traction(solver, [1e4, 2e3])
    state = solver.initial_state()
    for _ in range(3):
        state, _ = solver.step(state, tr)
    clamped = solver.space.boundary_nodes[solver.tags["clamped"]]
    assert np.allclose(np.asarray(state.displacement)[clamped], 0.0)
    assert np.allclose(np.asarray(state.velocity)[clamped], 0.0)


def test_fsi3_scenario_runs():
    solver = make_solver(scenario="FSI3", type_lin="CG", poly_degree=3, delta_t=0.005)
    assert solver.space.n_dofs == 1100  # 18x3 cells, deg 3, dim 2
    tr = uniform_traction(solver, [0.0, 1000.0])
    state, info = solver.step(solver.initial_state(), tr)
    assert bool(info.residual < 1e-10) or int(info.iterations) > 0
    tip = np.argmax(solver.mesh.nodes[:, 0])
    assert abs(float(state.displacement[tip, 1])) > 0


def test_mixed_precision_ir_cg_matches_f64():
    """solve_dtype=float32 (f32 CG inside f64 iterative refinement) meets
    the reference's absolute 1e-10 residual contract and reproduces the
    all-f64 trajectory."""
    traj = {}
    for sdt, precond in (("", "MG"), ("float32", "MG"), ("float32", "Jacobi")):
        m = make_solver(preconditioner=precond, solve_dtype=sdt)
        state = m.initial_state()
        for _ in range(5):
            state, info = m.step(state, uniform_traction(m, [2000.0, 0.0]))
            # the true f64 residual passed the absolute tolerance
            assert float(info.residual) <= 1e-10, (sdt, precond)
        traj[(sdt, precond)] = np.asarray(state.displacement)
    ref = traj[("", "MG")]
    for key in (("float32", "MG"), ("float32", "Jacobi")):
        err = np.linalg.norm(traj[key] - ref) / np.linalg.norm(ref)
        assert err < 1e-9, (key, err)
