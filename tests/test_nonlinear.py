"""Nonlinear path validation: the Neo-Hookean material against autodiff of
its own strain energy, small-strain consistency with the linear operator,
tangent exactness, Newton convergence behavior, and Newmark kinematics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics
from dealii_adapter_tpu.models.material import NeoHookean, det_and_inv, kinematics
from dealii_adapter_tpu.models.nonlinear_elasticity import (
    NonlinearElasticity,
    NonlinearState,
)
from dealii_adapter_tpu.ops.element_ops import ElementMatrices, make_operator

MU, NU, RHO = 0.5e6, 0.4, 1000.0


def make_solver(**kw):
    defaults = dict(
        scenario="PF",
        model="neo-Hookean",
        mu=MU,
        nu=NU,
        rho=RHO,
        poly_degree=2,
        delta_t=0.01,
        end_time=0.1,
        type_lin="CG",
        tol_lin=1e-6,
        max_iterations_lin=10.0,
        max_iterations_NR=12,
        dim=2,
    )
    qs = kw.pop("quasi_static", False)
    defaults.update(kw)
    return NonlinearElasticity(AllParameters(**defaults), quasi_static=qs)


def interface_stress(solver, t):
    s = np.zeros((solver.space.n_nodes, solver.params.dim))
    s[solver.space.boundary_nodes[solver.interface_id]] = t
    return jnp.asarray(s)


# ---------------------------------------------------------------------------
# material model
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dim", [2, 3])
def test_tau_is_energy_conjugate(dim):
    """tau = P F^T with P = dPsi/dF — checks the stress formula against
    autodiff of the implemented strain energy, independently of the
    reference's closed forms."""
    mat = NeoHookean(MU, NU, RHO)
    rng = np.random.default_rng(7)
    grad_u = jnp.asarray(0.2 * rng.normal(size=(dim, dim)))

    def psi_of_F(F):
        J, _ = det_and_inv(F)
        b = F @ F.T
        b_bar = J ** (-2.0 / dim) * b
        return mat.psi(J, b_bar)

    F = grad_u + jnp.eye(dim)
    P = jax.grad(psi_of_F)(F)
    tau_ad = P @ F.T
    _, J, _, b_bar = kinematics(grad_u)
    tau = mat.tau(J, b_bar)
    assert np.allclose(np.asarray(tau_ad), np.asarray(tau), rtol=1e-9, atol=1e-6)
    # symmetric
    assert np.allclose(np.asarray(tau), np.asarray(tau).T, atol=1e-8)


def test_tau_zero_at_identity():
    mat = NeoHookean(MU, NU, RHO)
    for dim in (2, 3):
        _, J, _, b_bar = kinematics(jnp.zeros((dim, dim)))
        assert np.allclose(np.asarray(mat.tau(J, b_bar)), 0.0, atol=1e-9)
        assert np.isclose(float(mat.psi(J, b_bar)), 0.0)


def test_Jc_at_identity_is_isotropic_tangent():
    """At F=I: Jc = lambda_eff IxI + 2 mu S with lambda_eff = kappa - 2mu/dim."""
    mat = NeoHookean(MU, NU, RHO)
    for dim in (2, 3):
        _, J, _, b_bar = kinematics(jnp.zeros((dim, dim)))
        Jc = np.asarray(mat.Jc(J, b_bar))
        lam = mat.kappa - 2 * MU / dim
        eye = np.eye(dim)
        IxI = np.einsum("ij,kl->ijkl", eye, eye)
        S = 0.5 * (
            np.einsum("ik,jl->ijkl", eye, eye) + np.einsum("il,jk->ijkl", eye, eye)
        )
        assert np.allclose(Jc, lam * IxI + 2 * MU * S, rtol=1e-10)


def test_kinematics_det_inv():
    rng = np.random.default_rng(1)
    for dim in (2, 3):
        A = jnp.asarray(np.eye(dim) + 0.3 * rng.normal(size=(5, dim, dim)))
        det, inv = det_and_inv(A)
        assert np.allclose(np.asarray(det), np.linalg.det(np.asarray(A)), rtol=1e-10)
        assert np.allclose(np.asarray(inv), np.linalg.inv(np.asarray(A)), rtol=1e-9)
        # b_bar is unimodular
        _, J, _, b_bar = kinematics(A - jnp.eye(dim))
        detb, _ = det_and_inv(b_bar)
        assert np.allclose(np.asarray(detb), 1.0, rtol=1e-9)


# ---------------------------------------------------------------------------
# residual / tangent
# ---------------------------------------------------------------------------


def test_internal_force_small_strain_limit():
    """F_int linearized at zero equals the linear elastic operator with
    moduli (lambda_eff, mu)."""
    solver = make_solver(poly_degree=1)
    space = solver.space
    lam_eff = solver.material.kappa - 2 * MU / 2
    elem = ElementMatrices(space, lam_eff, MU, RHO)
    K = make_operator(space, elem.K_e)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(space.n_nodes, 2)))
    _, jvp = jax.linearize(solver.internal_force, jnp.zeros_like(u))
    got = np.asarray(jvp(u))
    want = np.asarray(K(u))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-3)


def test_residual_tangent_matches_finite_differences():
    solver = make_solver(poly_degree=1)
    rng = np.random.default_rng(5)
    n, d = solver.space.n_nodes, 2
    state = NonlinearState(
        displacement=jnp.asarray(0.003 * rng.normal(size=(n, d))) * solver.mask,
        velocity=jnp.asarray(0.01 * rng.normal(size=(n, d))),
        acceleration=jnp.asarray(0.01 * rng.normal(size=(n, d))),
    )
    stress = interface_stress(solver, [500.0, 100.0])

    def rhs_fn(delta):
        r, _ = solver.residual(delta, state, stress)
        return r

    def rhs_no_ext(delta):
        # internal + inertia only: the part the Newton tangent linearizes
        # (the Neumann pull-back is stop_gradient-ed, mirroring the
        # reference's tangent which omits the follower-load term)
        r, _ = solver.residual(delta, state, stress)
        return r - solver.mask * solver.external_force(
            state.displacement + delta, stress
        )

    delta0 = jnp.asarray(0.001 * rng.normal(size=(n, d))) * solver.mask
    v = jnp.asarray(rng.normal(size=(n, d))) * solver.mask
    _, jvp = jax.linearize(rhs_fn, delta0)
    got = np.asarray(jvp(v))
    eps = 1e-7
    fd = (
        np.asarray(rhs_no_ext(delta0 + eps * v))
        - np.asarray(rhs_no_ext(delta0 - eps * v))
    ) / (2 * eps)
    scale = np.max(np.abs(fd)) + 1.0
    assert np.allclose(got, fd, atol=3e-5 * scale)
    # and the follower-load term is indeed excluded from the tangent:
    _, jvp_noext = jax.linearize(rhs_no_ext, delta0)
    assert np.allclose(np.asarray(jvp_noext(v)), got, atol=1e-9 * scale)


def test_external_force_at_zero_matches_linear_face_loading():
    """With u=0 the Nanson scale is 1 and the pulled-back loading equals the
    linear solver's consistent face integration."""
    nl = make_solver(poly_degree=2)
    lin = LinearElastodynamics(
        AllParameters(
            scenario="PF", mu=MU, nu=NU, rho=RHO, poly_degree=2, dim=2,
            type_lin="Direct",
        )
    )
    # same traction field on both (boundary ids differ: 7 vs 6)
    t = [800.0, -300.0]
    s_nl = interface_stress(nl, t)
    s_lin = np.zeros((lin.space.n_nodes, 2))
    s_lin[lin.space.boundary_nodes[lin.interface_id]] = t
    u0 = jnp.zeros((nl.space.n_nodes, 2))
    got = np.asarray(nl.external_force(u0, s_nl))
    want = np.asarray(lin.face_load(jnp.asarray(s_lin)))
    assert np.allclose(got, want, rtol=1e-10, atol=1e-8)


def test_force_read_data_rejected():
    with pytest.raises(ValueError, match="neo-Hookean"):
        make_solver(read_data_name="Force")


# ---------------------------------------------------------------------------
# Newton + Newmark
# ---------------------------------------------------------------------------


def test_quasi_static_newton_converges_and_matches_linear_at_small_load():
    nl = make_solver(poly_degree=1, quasi_static=True, type_lin="CG")
    lam_eff = nl.material.kappa - 2 * MU / 2
    stress = interface_stress(nl, [0.2, 0.0])  # tiny load -> linear regime
    state, info = nl.step(nl.initial_state(), stress)
    assert bool(info.converged)
    assert float(info.min_det_F) > 0.99
    # compare to static linear solution with (lambda_eff, mu)
    from dealii_adapter_tpu.ops.element_ops import assemble_dense
    from dealii_adapter_tpu.ops.element_ops import make_face_loading

    elem = ElementMatrices(nl.space, lam_eff, MU, RHO)
    K = assemble_dense(nl.space, elem.K_e)
    m = np.asarray(nl.mask).reshape(-1)
    Kb = K * m[:, None] * m[None, :]
    np.fill_diagonal(Kb, np.diag(Kb) + (1 - m))
    fl = make_face_loading(nl.space, elem, nl.interface_id)
    F = np.asarray(fl(stress)).reshape(-1) * m
    d_lin = np.linalg.solve(Kb, F).reshape(-1, 2)
    d_nl = np.asarray(state.displacement)
    ref = np.max(np.abs(d_lin))
    assert np.max(np.abs(d_nl - d_lin)) < 1e-3 * ref


def test_quasi_static_large_load_stepping():
    """Load stepping to a visibly nonlinear deflection; Newton must converge
    each step with positive J (BASELINE config 3)."""
    nl = make_solver(poly_degree=2, quasi_static=True)
    state = nl.initial_state()
    for load in (30.0, 60.0, 90.0):
        state, info = nl.step(state, interface_stress(nl, [load, 0.0]))
        assert bool(info.converged), float(info.residual_rel)
        assert float(info.min_det_F) > 0.0
    tipnode = int(np.argmax(nl.mesh.nodes[:, 1]))
    tip_dx = float(state.displacement[tipnode, 0])
    assert tip_dx > 0.05  # large deformation reached
    # geometric nonlinearity: deflection is NOT 3x the small-load answer
    s2, _ = nl.step(nl.initial_state(), interface_stress(nl, [30.0, 0.0]))
    assert abs(tip_dx - 3 * float(s2.displacement[tipnode, 0])) > 0.01 * tip_dx


def test_newton_iteration_count_reasonable():
    nl = make_solver(poly_degree=2, quasi_static=True)
    _, info = nl.step(nl.initial_state(), interface_stress(nl, [50.0, 0.0]))
    assert bool(info.converged)
    assert int(info.iterations) <= 8


def test_dynamic_newmark_step_and_kinematic_identities():
    nl = make_solver(poly_degree=1, delta_t=0.005)
    p = nl.params
    stress = interface_stress(nl, [1000.0, 0.0])
    s0 = nl.initial_state()
    s1, info1 = nl.step(s0, stress)
    assert bool(info1.converged)
    s2, info2 = nl.step(s1, stress)
    assert bool(info2.converged)
    # Newmark identities between consecutive states:
    dt, beta, gamma = p.delta_t, p.beta, p.gamma
    d0, v0, a0 = (np.asarray(x) for x in s1)
    d1, v1, a1 = (np.asarray(x) for x in s2)
    lhs_d = d1
    rhs_d = d0 + dt * v0 + dt**2 * ((0.5 - beta) * a0 + beta * a1)
    assert np.allclose(lhs_d, rhs_d, atol=1e-10)
    lhs_v = v1
    rhs_v = v0 + dt * ((1 - gamma) * a0 + gamma * a1)
    assert np.allclose(lhs_v, rhs_v, atol=1e-10)


def test_dynamic_small_amplitude_matches_linear_model():
    """At tiny loads the Neo-Hookean dynamics must track the linear solver
    with moduli (lambda_eff, mu): same consistent mass, Newmark(1/4,1/2) ==
    trapezoidal == theta(1/2) for linear problems."""
    dt = 0.005
    nl = make_solver(poly_degree=1, delta_t=dt)
    lam_eff = nl.material.kappa - 2 * MU / 2
    # linear solver with matching moduli: mu param + custom nu giving lam_eff
    nu_eff = lam_eff / (2 * (lam_eff + MU))
    lin = LinearElastodynamics(
        AllParameters(
            scenario="PF", mu=MU, nu=nu_eff, rho=RHO, poly_degree=1, dim=2,
            delta_t=dt, theta=0.5, type_lin="Direct",
        )
    )
    t = [1.0, 0.0]
    s_nl = interface_stress(nl, t)
    s_li = np.zeros((lin.space.n_nodes, 2))
    s_li[lin.space.boundary_nodes[lin.interface_id]] = t
    s_li = jnp.asarray(s_li)
    st_nl, st_li = nl.initial_state(), lin.initial_state()
    for _ in range(4):
        st_nl, info = nl.step(st_nl, s_nl)
        assert bool(info.converged)
        st_li, _ = lin.step(st_li, s_li)
    d_nl = np.asarray(st_nl.displacement)
    d_li = np.asarray(st_li.displacement)
    ref = np.max(np.abs(d_li))
    assert ref > 0
    assert np.max(np.abs(d_nl - d_li)) < 5e-3 * ref


def test_mixed_precision_tangent_matches_f64():
    """solve_dtype=float32 (inexact Newton: f32 inner Krylov, f64
    residual/state) converges to the same solution as the all-f64 solve,
    with at most one extra Newton iteration."""
    results = {}
    for tdt, precond in (("", "MG"), ("float32", "MG"), ("float32", "Jacobi")):
        m = make_solver(preconditioner=precond, solve_dtype=tdt)
        st, info = m.step(m.initial_state(), interface_stress(m, [5000.0, 0.0]))
        assert bool(info.converged), (tdt, precond)
        results[(tdt, precond)] = (
            np.asarray(st.displacement),
            int(info.iterations),
        )
    ref, ref_its = results[("", "MG")]
    for key in (("float32", "MG"), ("float32", "Jacobi")):
        mix, mix_its = results[key]
        # both residuals pass tol_f in f64; the solutions agree to (well
        # within) the 1e-6 relative Newton update tolerance
        assert np.linalg.norm(mix - ref) <= 1e-6 * np.linalg.norm(ref), key
        assert abs(mix_its - ref_its) <= 1, key


def test_eisenstat_walker_forcing_matches_fixed():
    """newton_forcing='ew' meets the same tol_u/tol_f contract with fewer
    total CG iterations; solutions agree to the Newton tolerance."""
    out = {}
    for forcing in ("fixed", "ew"):
        m = make_solver(preconditioner="MG", newton_forcing=forcing)
        st, info = m.step(m.initial_state(), interface_stress(m, [5000.0, 0.0]))
        assert bool(info.converged), forcing
        assert float(info.residual_rel) <= 1e-9 or float(info.residual_abs) <= 5e-9
        out[forcing] = (np.asarray(st.displacement), int(info.cg_iterations))
    ref, ref_cg = out["fixed"]
    ew, ew_cg = out["ew"]
    assert np.linalg.norm(ew - ref) <= 1e-6 * np.linalg.norm(ref)
    assert ew_cg < ref_cg, (ew_cg, ref_cg)


def test_newton_predictor_matches_reference_start():
    """The Newmark predictor start changes only the iteration path, not the
    converged trajectory."""
    traj = {}
    for pred in (False, True):
        m = make_solver(preconditioner="MG", newton_forcing="ew",
                        newton_predictor=pred)
        state = m.initial_state()
        for _ in range(4):
            state, info = m.step(state, interface_stress(m, [5000.0, 0.0]))
            assert bool(info.converged), pred
        traj[pred] = np.asarray(state.displacement)
    err = np.linalg.norm(traj[True] - traj[False])
    assert err <= 1e-5 * np.linalg.norm(traj[False]), err


def test_mixed_residual_schedule_iteration_parity():
    """The mixed Newton-residual schedule (f32 evaluations far above the
    measured noise floor, predictive f64 handback near it) must not cost
    Newton iterations vs forcing every evaluation to f64 — the
    nonzero-iterate floor calibration + next-residual prediction exist
    exactly for this (regression guards: the current-residual-only rule
    cost +2 its; calibrating at the u=0 iterate of step 0 measured a zero
    floor and cost +2 stall-detected its there)."""
    import jax.numpy as jnp

    def run(sched):
        m = make_solver(
            dim=3,
            preconditioner="MG",
            precond_dtype="bfloat16",
            solve_dtype="float32",
            newton_forcing="ew",
            ew_eta0=0.3,
            newton_predictor=True,
            mg_smooth_degree=3,
            newton_residual=sched,
        )
        st = m.initial_state()
        stress = interface_stress(m, [5000.0, 0.0, 0.0])
        newton = cg = 0
        for _ in range(3):
            st, info = m.step(st, stress)
            assert bool(info.converged)
            newton += int(info.iterations)
            cg += int(info.cg_iterations)
        return float(jnp.max(jnp.abs(st.displacement))), newton, cg

    u64, n64, c64 = run("f64")
    umx, nmx, cmx = run("mixed")
    assert abs(umx - u64) <= 1e-6 * abs(u64)
    assert nmx <= n64, (nmx, n64)
    assert cmx <= c64 + 2, (cmx, c64)


def _run_production_steps(n_steps=3, traction=5000.0, **kw):
    m = make_solver(
        dim=3,
        preconditioner="MG",
        precond_dtype="bfloat16",
        solve_dtype="float32",
        newton_forcing="ew",
        ew_eta0=0.3,
        newton_predictor=True,
        mg_smooth_degree=3,
        **kw,
    )
    st = m.initial_state()
    stress = interface_stress(m, [traction, 0.0, 0.0])
    newton = cg = 0
    for _ in range(n_steps):
        st, info = m.step(st, stress)
        assert bool(info.converged), (
            int(info.iterations), float(info.residual_rel)
        )
        newton += int(info.iterations)
        cg += int(info.cg_iterations)
    return float(jnp.max(jnp.abs(st.displacement))), newton, cg, m


def test_newton_tangent_reuse_parity():
    """Modified Newton (`newton_tangent_reuse`): freezing the assembled
    tangent after iteration 1 must preserve the convergence CONTRACT (the
    dual rel/abs rule is decided on exact residuals either way, so the
    converged trajectory matches to solver tolerance) at a bounded
    iteration-count cost. (The round-5 hardware A/B measured that cost —
    +1-2 its/step — to EXCEED the skipped assemblies' 27-34 ms at the
    bench shape, which is why reuse is not the bench default; this test
    pins that the opt-in feature stays contract-preserving.)"""
    u_exact, n_exact, c_exact, m0 = _run_production_steps()
    assert m0._use_assembled
    u_reuse, n_reuse, c_reuse, _ = _run_production_steps(
        newton_tangent_reuse=True
    )
    assert abs(u_reuse - u_exact) <= 1e-6 * abs(u_exact), (u_reuse, u_exact)
    # frozen-tangent Newton converges linearly instead of quadratically:
    # measured +5 its over the 3 steps (16 -> 21) on this shape — bound
    # at +2 per step
    assert n_reuse <= n_exact + 6, (n_reuse, n_exact)


def test_newton_tangent_reuse_safeguard_large_step():
    """At a large deformation increment (cold start, stiff traction) the
    iterate moves far from the predictor, the frozen tangent goes stale,
    and only the refresh safeguard (re-assemble when an iteration fails
    to cut the residual below `tangent_refresh_ratio`) keeps Newton
    converging. Must converge to the exact-tangent trajectory.

    Traction 30000 is the largest probed load where the EXACT-tangent
    production config still converges in 2 dynamic steps on this mesh
    (50000 diverges for both paths — det F goes negative mid-iterate),
    while still forcing increments large enough that the frozen tangent
    goes stale (measured: reuse pays +4 its over the 2 steps)."""
    u_exact, n_exact, _, _ = _run_production_steps(
        n_steps=2, traction=30000.0
    )
    u_reuse, n_reuse, _, _ = _run_production_steps(
        n_steps=2, traction=30000.0, newton_tangent_reuse=True
    )
    assert abs(u_reuse - u_exact) <= 1e-5 * abs(u_exact), (u_reuse, u_exact)
    assert n_reuse <= n_exact + 6, (n_reuse, n_exact)
