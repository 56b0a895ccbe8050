"""Assembled per-cell tangent vs the `jax.linearize` tangent.

The two backends must be the SAME linear operator (both freeze the
linearization at the Newton iterate; `nonlinear_elasticity.cc:1044-1087`
is the reference seam being re-provided). Kernel-level exactness is
checked in f64; model-level equivalence checks Newton/CG behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dealii_adapter_tpu  # noqa: F401  (x64 config)
from dealii_adapter_tpu.config import AllParameters
from dealii_adapter_tpu.fem.tabulation import tabulate
from dealii_adapter_tpu.mesh.generator import make_scenario_grid
from dealii_adapter_tpu.models.material import NeoHookean
from dealii_adapter_tpu.models.nonlinear_elasticity import (
    NonlinearElasticity,
    internal_force_cellwise_T,
)
from dealii_adapter_tpu.ops.assembled_tangent import (
    apply_cell_tangents,
    assemble_cell_tangents,
    tangent_bytes,
)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_cell_tangent_matches_linearize(dim, degree):
    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :])
    w = jnp.asarray(tab.q_weights * float(np.prod(h)))
    npc, c = tab.n_nodes, 4
    # amplitude small enough that det F > 0 everywhere (checked below);
    # NaN poisoning would otherwise vacuously pass assert_allclose
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(0), (dim, npc, c), dtype=jnp.float64
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(1), (dim, npc, c), dtype=jnp.float64
    )
    m = jnp.asarray(
        np.einsum("q,qi,qj->ij", np.asarray(w), tab.N, tab.N)
    )

    @jax.jit
    def run(ut, vt):
        minJ = internal_force_cellwise_T(ut, G, w, mat)[1]
        _, jvp = jax.linearize(
            lambda u: internal_force_cellwise_T(u, G, w, mat)[0], ut
        )
        ref = jvp(vt)
        got = apply_cell_tangents(
            assemble_cell_tangents(ut, G, w, mat), vt
        )
        got_auto = apply_cell_tangents(
            assemble_cell_tangents(ut, G, w, mat, method="autodiff"), vt
        )
        got_m = apply_cell_tangents(
            assemble_cell_tangents(ut, G, w, mat, mass_term=m), vt
        )
        ref_m = ref + jnp.einsum("ij,ejc->eic", m, vt)
        return minJ, ref, got, got_auto, ref_m, got_m

    minJ, ref, got, got_auto, ref_m, got_m = run(ut, vt)
    assert float(minJ) > 0.0, "test state inverted an element"
    assert np.isfinite(np.asarray(ref)).all()
    scale = float(jnp.max(jnp.abs(ref)))
    # closed-form (production) and autodiff (reference) paths, both vs the
    # linearized force
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * scale)
    np.testing.assert_allclose(got_auto, ref, rtol=0, atol=1e-12 * scale)
    np.testing.assert_allclose(got_m, ref_m, rtol=0, atol=1e-12 * scale)


def test_packed_pallas_matvec_interpret():
    """pack + Pallas kernel == nested-list FMA sweep (interpret mode runs
    the kernel on CPU)."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_packed_tangents_pallas,
        pack_cell_tangents,
    )

    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    dim, degree = 3, 1
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :], dtype=jnp.float32)
    w = jnp.asarray(tab.q_weights * float(np.prod(h)), dtype=jnp.float32)
    npc, c, bc = tab.n_nodes, 96, 32
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(2), (dim, npc, c), dtype=jnp.float32
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(3), (dim, npc, c), dtype=jnp.float32
    )
    K = assemble_cell_tangents(ut, G, w, mat)
    ref = apply_cell_tangents(K, vt)
    Kp = pack_cell_tangents(K)
    got = apply_packed_tangents_pallas(
        Kp, vt.reshape(dim * npc, c), block_c=bc, interpret=True
    ).reshape(dim, npc, c)
    # f32 with different summation order: roundoff-level agreement only
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5 * scale
    )


@pytest.mark.parametrize("dim,degree", [(2, 1), (3, 1), (3, 2)])
def test_sym_blocks_match_full(dim, degree):
    """Upper-block-symmetric assembly+apply is the same operator as the
    full nine-block path (f64: roundoff-tight), with and without the
    Newmark mass term."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_cell_tangents_sym,
        assemble_cell_tangents_sym,
        upper_blocks,
    )

    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :])
    w = jnp.asarray(tab.q_weights * float(np.prod(h)))
    npc, c = tab.n_nodes, 4
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(4), (dim, npc, c), dtype=jnp.float64
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(5), (dim, npc, c), dtype=jnp.float64
    )
    m = jnp.asarray(
        np.einsum("q,qi,qj->ij", np.asarray(w), tab.N, tab.N)
    )

    for mass in (None, m):
        ref = apply_cell_tangents(
            assemble_cell_tangents(ut, G, w, mat, mass_term=mass), vt
        )
        Ku = assemble_cell_tangents_sym(ut, G, w, mat, mass_term=mass)
        assert len(Ku) == len(upper_blocks(dim))
        got = apply_cell_tangents_sym(Ku, vt)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12 * scale
        )

    # diagonal blocks are exactly symmetric (bitwise, not just close)
    Ku = assemble_cell_tangents_sym(ut, G, w, mat, mass_term=m)
    for (d, e), Kde in zip(upper_blocks(dim), Ku):
        if d == e:
            np.testing.assert_array_equal(
                np.asarray(Kde), np.asarray(Kde.transpose(1, 0, 2))
            )


def test_packed_sym_pallas_matvec_interpret():
    """Upper-block pack + sym Pallas kernel == the XLA sym FMA sweep."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_cell_tangents_sym,
        apply_packed_tangents_sym_pallas,
        assemble_cell_tangents_sym,
        pack_cell_tangents_sym,
    )

    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    dim, degree = 3, 1
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :], dtype=jnp.float32)
    w = jnp.asarray(tab.q_weights * float(np.prod(h)), dtype=jnp.float32)
    npc, c, bc = tab.n_nodes, 96, 32
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(6), (dim, npc, c), dtype=jnp.float32
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(7), (dim, npc, c), dtype=jnp.float32
    )
    Ku = assemble_cell_tangents_sym(ut, G, w, mat)
    ref = apply_cell_tangents_sym(Ku, vt)
    Kp = pack_cell_tangents_sym(Ku)
    got = apply_packed_tangents_sym_pallas(
        Kp, vt.reshape(dim * npc, c), dim, npc, block_c=bc, interpret=True
    ).reshape(dim, npc, c)
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5 * scale
    )


@pytest.mark.parametrize("sym", [False, True])
def test_padded_input_assembly_matches(sym):
    """The model's pad-before-assembly optimization (pad the ~25 MB input
    patches instead of the ~1 GB materialized tangent): assembling padded
    patches and slicing the kernel output back to c lanes equals the
    unpadded reference. Padded lanes hold u=0 -> F=I, a benign tangent."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_cell_tangents,
        apply_cell_tangents_sym,
        apply_packed_tangents_pallas,
        apply_packed_tangents_sym_pallas,
        assemble_cell_tangents,
        assemble_cell_tangents_sym,
        pack_cell_tangents,
        pack_cell_tangents_sym,
    )

    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    dim, degree = 3, 1
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :], dtype=jnp.float32)
    w = jnp.asarray(tab.q_weights * float(np.prod(h)), dtype=jnp.float32)
    npc, c, bc = tab.n_nodes, 90, 32
    pad = (-c) % bc
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(8), (dim, npc, c), dtype=jnp.float32
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(9), (dim, npc, c), dtype=jnp.float32
    )
    ut_pad = jnp.pad(ut, ((0, 0), (0, 0), (0, pad)))
    v2 = jnp.pad(vt.reshape(dim * npc, c), ((0, 0), (0, pad)))

    if sym:
        ref = apply_cell_tangents_sym(
            assemble_cell_tangents_sym(ut, G, w, mat), vt
        )
        Kp = pack_cell_tangents_sym(
            assemble_cell_tangents_sym(ut_pad, G, w, mat)
        )
        got = apply_packed_tangents_sym_pallas(
            Kp, v2, dim, npc, block_c=bc, interpret=True
        )[:, :c].reshape(dim, npc, c)
    else:
        ref = apply_cell_tangents(
            assemble_cell_tangents(ut, G, w, mat), vt
        )
        Kp = pack_cell_tangents(
            assemble_cell_tangents(ut_pad, G, w, mat)
        )
        got = apply_packed_tangents_pallas(
            Kp, v2, block_c=bc, interpret=True
        )[:, :c].reshape(dim, npc, c)
    assert np.isfinite(np.asarray(Kp)).all()
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5 * scale
    )


def test_model_step_block_symmetric_matches():
    """tangent_block_symmetric=True reproduces the full-storage
    trajectory on the production solver config (same Newton its, solution
    equal to inexact-Newton noise)."""
    results = {}
    for sym in (False, True):
        params = AllParameters(
            model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
            poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
            tol_lin=1e-6, tol_u=1e-6, tol_f=1e-9, max_iterations_NR=10,
            max_iterations_lin=1.0, dtype="float64",
            solve_dtype="float32", preconditioner="MG",
            precond_dtype="bfloat16", newton_forcing="ew",
            newton_predictor=True, tangent_backend="assembled",
            tangent_block_symmetric=sym,
        )
        mesh, tags = make_scenario_grid(
            "PF", 3, 2, scale=1, solver="neo-Hookean"
        )
        model = NonlinearElasticity(params, mesh=mesh, tags=tags)
        stress_np = np.zeros((model.space.n_nodes, 3))
        stress_np[model.space.boundary_nodes[model.interface_id], 0] = 1000.0
        stress = jnp.asarray(stress_np, dtype=model.dtype)
        state = model.initial_state()
        for _ in range(2):
            state, info = model.step(state, stress)
            assert bool(info.converged)
        results[sym] = (state, int(info.iterations))

    u_full = results[False][0].displacement
    u_sym = results[True][0].displacement
    err = float(jnp.linalg.norm(u_sym - u_full) / jnp.linalg.norm(u_full))
    assert err < 1e-6, err
    assert results[True][1] == results[False][1]


def _model(tangent_backend):
    params = AllParameters(
        model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
        poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
        tol_lin=1e-6, tol_u=1e-6, tol_f=1e-9, max_iterations_NR=10,
        max_iterations_lin=1.0, dtype="float64",
        solve_dtype="float32", preconditioner="MG",
        precond_dtype="bfloat16", newton_forcing="ew",
        newton_predictor=True, tangent_backend=tangent_backend,
    )
    mesh, tags = make_scenario_grid("PF", 3, 2, scale=1, solver="neo-Hookean")
    return NonlinearElasticity(params, mesh=mesh, tags=tags)


def test_model_step_equivalent_backends():
    """Same trajectory and same-ballpark iteration counts for both
    tangent backends on the production solver config."""
    results = {}
    for backend in ("jvp", "assembled"):
        model = _model(backend)
        assert model._use_assembled == (backend == "assembled")
        stress_np = np.zeros((model.space.n_nodes, 3))
        stress_np[model.space.boundary_nodes[model.interface_id], 0] = 1000.0
        stress = jnp.asarray(stress_np, dtype=model.dtype)
        state = model.initial_state()
        for _ in range(2):
            state, info = model.step(state, stress)
            assert bool(info.converged)
        results[backend] = (state, int(info.iterations), int(info.cg_iterations))

    u_jvp = results["jvp"][0].displacement
    u_asm = results["assembled"][0].displacement
    err = float(
        jnp.linalg.norm(u_asm - u_jvp) / jnp.linalg.norm(u_jvp)
    )
    # both paths solve the same Newton systems to the same tolerances;
    # differences are inexact-Newton noise well below tol_u
    assert err < 1e-6, err
    assert results["assembled"][1] == results["jvp"][1]  # newton its


def test_assembled_rejected_without_mixed_solve():
    with pytest.raises(ValueError, match="assembled"):
        params = AllParameters(
            model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
            poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
            dtype="float64", solve_dtype="", tangent_backend="assembled",
        )
        mesh, tags = make_scenario_grid(
            "PF", 3, 2, scale=1, solver="neo-Hookean"
        )
        NonlinearElasticity(params, mesh=mesh, tags=tags)


def test_auto_falls_back_when_tangent_too_big():
    params = AllParameters(
        model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
        poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
        dtype="float64", solve_dtype="float32",
        tangent_backend="auto", assembled_tangent_max_gb=1e-6,
    )
    mesh, tags = make_scenario_grid("PF", 3, 2, scale=1, solver="neo-Hookean")
    model = NonlinearElasticity(params, mesh=mesh, tags=tags)
    assert not model._use_assembled
    assert tangent_bytes(model.space, jnp.float32) > 1e3


@pytest.mark.parametrize("sym", [False, True])
def test_bf16_storage_symmetric_and_close(sym):
    """tangent_store_dtype='bfloat16' (`out_dtype`): the stored operator
    is exactly symmetric after rounding and entry-wise within bf16
    tolerance of the f32-stored tangent; the apply accumulates in the
    input dtype (f32), not bf16."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_cell_tangents_sym,
        assemble_cell_tangents_sym,
        upper_blocks,
    )

    dim, degree = 3, 2
    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :], dtype=jnp.float32)
    w = jnp.asarray(
        tab.q_weights * float(np.prod(h)), dtype=jnp.float32
    )
    npc, c = tab.n_nodes, 4
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(0), (dim, npc, c), dtype=jnp.float32
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(1), (dim, npc, c), dtype=jnp.float32
    )

    if sym:
        K32 = assemble_cell_tangents_sym(ut, G, w, mat)
        Kbf = assemble_cell_tangents_sym(
            ut, G, w, mat, out_dtype=jnp.bfloat16
        )
        blocks = list(zip(upper_blocks(dim), K32, Kbf))
        out = apply_cell_tangents_sym(Kbf, vt)
    else:
        K32l = assemble_cell_tangents(ut, G, w, mat)
        Kbfl = assemble_cell_tangents(
            ut, G, w, mat, out_dtype=jnp.bfloat16
        )
        blocks = [
            ((d, e), K32l[d][e], Kbfl[d][e])
            for d in range(dim)
            for e in range(dim)
        ]
        out = apply_cell_tangents(Kbfl, vt)
        # full storage: rounding an exactly-symmetric K entry-wise keeps
        # K[d][e] = K[e][d]^T bitwise
        for d in range(dim):
            for e in range(dim):
                np.testing.assert_array_equal(
                    np.asarray(Kbfl[d][e]),
                    np.asarray(Kbfl[e][d].transpose(1, 0, 2)),
                )

    assert out.dtype == vt.dtype  # f32 accumulate, not bf16
    for (_, _), k32, kbf in blocks:
        assert kbf.dtype == jnp.bfloat16
        a32 = np.asarray(k32, dtype=np.float64)
        abf = np.asarray(kbf, dtype=np.float64)
        scale = np.max(np.abs(a32))
        # bf16 has 8 significand bits -> entry error <= 2^-8 * |entry|
        np.testing.assert_allclose(abf, a32, rtol=0, atol=scale * 2**-8)


@pytest.mark.parametrize("sym", [False, True])
def test_block_refs_pallas_matvec_interpret(sym):
    """The pack-free block-ref Pallas kernels reproduce the XLA block
    applies exactly (interpret mode): same FMA order per block, no packed
    copy of the tangent."""
    from dealii_adapter_tpu.ops.assembled_tangent import (
        apply_block_tangents_pallas,
        apply_cell_tangents_sym,
        apply_sym_block_tangents_pallas,
        assemble_cell_tangents_sym,
    )

    dim, degree = 3, 2
    mat = NeoHookean(mu=0.5e6, nu=0.4, rho=1000.0)
    tab = tabulate(dim, degree, degree + 2)
    h = np.full(dim, 0.1)
    G = jnp.asarray(tab.dN / h[None, None, :], dtype=jnp.float32)
    w = jnp.asarray(tab.q_weights * float(np.prod(h)), dtype=jnp.float32)
    npc, c, bc = tab.n_nodes, 8, 4
    ut = 0.004 * jax.random.normal(
        jax.random.PRNGKey(0), (dim, npc, c), dtype=jnp.float32
    )
    vt = jax.random.normal(
        jax.random.PRNGKey(1), (dim, npc, c), dtype=jnp.float32
    )
    v2 = vt.reshape(dim * npc, c)

    if sym:
        Ku = assemble_cell_tangents_sym(ut, G, w, mat)
        ref = apply_cell_tangents_sym(Ku, vt)
        got = apply_sym_block_tangents_pallas(
            Ku, v2, dim, npc, block_c=bc, interpret=True
        ).reshape(dim, npc, c)
    else:
        K = assemble_cell_tangents(ut, G, w, mat)
        ref = apply_cell_tangents(K, vt)
        got = apply_block_tangents_pallas(
            K, v2, block_c=bc, interpret=True
        ).reshape(dim, npc, c)
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5 * scale
    )


def test_bf16_assembly_precision_divergence_class_pinned_on_cpu():
    """Round-4 hardware finding: 1-pass bf16 tangent assembly
    (`tangent_assembly_precision="default"`) DIVERGES Newton at
    production scale, and CPU tests never caught it because
    Precision.DEFAULT is a no-op off-TPU. The 'bf16emu' tier rounds the
    assembly-matmul INPUTS to bf16 explicitly (faithful to one MXU pass:
    bf16 inputs, f32 accumulation), so the failure class reproduces on
    any backend: the same drive that converges cleanly at 'highest' must
    fail (or stall past the reference's iteration budget) at 'bf16emu'.
    Also pins the loud warning for the known-divergent tiers."""
    import warnings

    def run(precision):
        params = AllParameters(
            model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
            poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
            tol_lin=1e-6, tol_u=1e-6, tol_f=1e-9, max_iterations_NR=10,
            max_iterations_lin=1.0, dtype="float64",
            solve_dtype="float32", preconditioner="MG",
            precond_dtype="bfloat16", newton_forcing="ew",
            newton_predictor=True, tangent_backend="assembled",
            tangent_assembly_precision=precision,
        )
        mesh, tags = make_scenario_grid(
            "PF", 3, 2, scale=1, solver="neo-Hookean"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            model = NonlinearElasticity(params, mesh=mesh, tags=tags)
        if precision in ("default", "bf16emu"):
            assert any("DIVERGENT" in str(w.message) for w in caught), (
                "known-divergent assembly precision must warn loudly"
            )
        stress_np = np.zeros((model.space.n_nodes, 3))
        stress_np[model.space.boundary_nodes[model.interface_id], 0] = 5000.0
        stress = jnp.asarray(stress_np, dtype=model.dtype)
        state = model.initial_state()
        newton = 0
        bad = False
        for _ in range(2):
            state, info = model.step(state, stress)
            newton += int(info.iterations)
            if not bool(info.converged):
                bad = True
                break
        max_u = float(jnp.max(jnp.abs(state.displacement)))
        return bad, newton, max_u

    bad_hi, newton_hi, u_hi = run("highest")
    assert not bad_hi and u_hi < 1.0, (bad_hi, u_hi)

    bad_emu, newton_emu, u_emu = run("bf16emu")
    # the bug class must be VISIBLE on CPU: either Newton fails the
    # iteration budget, or it burns far more iterations, or the
    # "converged" solution is wrong by far more than the tolerances allow
    assert (
        bad_emu
        or newton_emu >= newton_hi + 4
        or abs(u_emu - u_hi) > 1e-3 * abs(u_hi)
    ), (bad_emu, newton_emu, newton_hi, u_emu, u_hi)
