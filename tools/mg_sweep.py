#!/usr/bin/env python
"""Sweep MG smoothing degree / preconditioner variants on the nonlinear
tangent at a given scale; reports total CG iterations and step wall time.

    python tools/mg_sweep.py [scale] [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dealii_adapter_tpu  # noqa: F401


def _enable_compile_cache():
    # persistent XLA compile cache (same dir bench.py uses): first compiles
    # at bench scale take minutes on the 1-core host, cached ones seconds
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()

# this image pre-imports jax via sitecustomize with the axon TPU plugin;
# honoring a JAX_PLATFORMS=cpu request needs jax.config (env alone does
# not stop the plugin's backend discovery — see tests/conftest.py)
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np


def run_variant(scale, **overrides):
    from dealii_adapter_tpu.config import AllParameters
    from dealii_adapter_tpu.mesh.generator import make_scenario_grid
    from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity

    kw = dict(
        model="neo-Hookean", type_lin="CG", scenario="PF", dim=3,
        poly_degree=2, delta_t=0.01, mu=0.5e6, nu=0.4, rho=1000.0,
        tol_lin=1e-6, tol_u=1e-6, tol_f=1e-9, max_iterations_NR=10,
        max_iterations_lin=1.0, dtype="float64",
        preconditioner="MG", precond_dtype="float32", solve_dtype="float32",
    )
    kw.update(overrides)
    params = AllParameters(**kw)
    mesh, tags = make_scenario_grid("PF", 3, kw["poly_degree"], scale=scale,
                                    solver="neo-Hookean")
    model = NonlinearElasticity(params, mesh=mesh, tags=tags)

    stress_np = np.zeros((model.space.n_nodes, 3))
    stress_np[model.space.boundary_nodes[model.interface_id], 0] = 1000.0
    stress = jnp.asarray(stress_np, dtype=model.dtype)
    state = model.initial_state()
    state, info = model.step(state, stress)  # warmup/compile
    # host readback closes the async pipeline honestly (block_until_ready
    # alone can return early on the axon backend — round-2 lesson)
    float(jnp.vdot(state.displacement, state.displacement))
    t0 = time.perf_counter()
    cg2 = 0
    for _ in range(2):
        state, info2 = model.step(state, stress)
        float(jnp.vdot(state.displacement, state.displacement))
        cg2 += int(info2.cg_iterations)
    dt_s = (time.perf_counter() - t0) / 2
    return dict(
        newton=int(info2.iterations), cg=cg2 // 2,
        converged=bool(info2.converged), seconds=round(dt_s, 3),
        max_u=float(jnp.max(jnp.abs(state.displacement))),
    )


VARIANTS = {
    "mg2": dict(mg_smooth_degree=2),
    "ew": dict(newton_forcing="ew"),
    "ew3pred": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", newton_predictor=True),
    "ew3e03": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", ew_eta0=0.3),
    "ew3prede03": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True),
    "ew3skip": dict(newton_forcing="ew", mg_smooth_degree=3, mg_skip_fine_smoothing=True),
    "ew3skipbf": dict(newton_forcing="ew", mg_smooth_degree=3, mg_skip_fine_smoothing=True, precond_dtype="bfloat16"),
    "ew4skip": dict(newton_forcing="ew", mg_smooth_degree=4, mg_skip_fine_smoothing=True),
    "ew3bf16": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16"),
    "ew3": dict(newton_forcing="ew", mg_smooth_degree=3),
    "mg2sem": dict(mg_smooth_degree=2, mg_fem_sem=True),
    "mg3sem": dict(mg_smooth_degree=3, mg_fem_sem=True),
    "mg3": dict(mg_smooth_degree=3),
    "mg4": dict(mg_smooth_degree=4),
    "mg2c20k": dict(mg_smooth_degree=2, mg_coarse_size=20000),
    "ew3predpal": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", newton_predictor=True, use_pallas=True),
    "ew3predf32pal": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="float32", newton_predictor=True, use_pallas=True),
    "ew2pred": dict(newton_forcing="ew", mg_smooth_degree=2, precond_dtype="bfloat16", newton_predictor=True),
    "ew4pred": dict(newton_forcing="ew", mg_smooth_degree=4, precond_dtype="bfloat16", newton_predictor=True),
    "ew3e03pal": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True),
    "ew4predpal": dict(newton_forcing="ew", mg_smooth_degree=4, precond_dtype="bfloat16", newton_predictor=True, use_pallas=True),
    "e03palf1": dict(newton_forcing="ew", mg_smooth_degree=3, mg_fine_smooth_degree=1, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True),
    "e03palf2": dict(newton_forcing="ew", mg_smooth_degree=3, mg_fine_smooth_degree=2, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True),
    "e03palf2pd": dict(newton_forcing="ew", mg_smooth_degree=3, mg_fine_smooth_degree=2, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True, tangent_assembly_precision="default"),
    # p+h first coarse level (no FEM-SEM) under the current production
    # extras — revisits the round-2 "p+h is worse" result now that
    # semi-coarsening + EW forcing changed the hierarchy economics
    "e03ph": dict(newton_forcing="ew", mg_smooth_degree=3, mg_fem_sem=False, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True),
    "e03phf4": dict(newton_forcing="ew", mg_smooth_degree=3, mg_fine_smooth_degree=4, mg_fem_sem=False, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True),
    # sum-factorized f64 residual formulation (vs the default dense
    # (q, npc) tabulation matmul — A/B pair for e03pal)
    "e03sf": dict(newton_forcing="ew", mg_smooth_degree=3, precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True, use_pallas=True, use_sumfact=True),
    "cheb": dict(preconditioner="Chebyshev", cheb_degree=4),
    "jac": dict(preconditioner="Jacobi"),
}

# round-3 production A/B matrix: the bench config (ew eta0=0.3, V(3,3)
# with fine degree 2, bf16 hierarchy, predictor, Pallas slab) crossed
# with the mixed-precision Newton residual schedule and the MXU Q1
# level-operator strategies
_PROD = dict(
    newton_forcing="ew", mg_smooth_degree=3, mg_fine_smooth_degree=2,
    precond_dtype="bfloat16", ew_eta0=0.3, newton_predictor=True,
    use_pallas=True,
)
VARIANTS.update(
    prod64=dict(_PROD, newton_residual="f64"),
    prodmix=dict(_PROD, newton_residual="mixed"),
    prodsten=dict(_PROD, newton_residual="mixed", mg_level_backend="stencil"),
    prodconv=dict(_PROD, newton_residual="mixed", mg_level_backend="stencil_conv"),
    prodband=dict(_PROD, newton_residual="mixed", mg_level_backend="stencil_banded"),
    prodbandf1=dict(
        _PROD, newton_residual="mixed", mg_level_backend="stencil_banded",
        mg_fine_smooth_degree=1,
    ),
    prodmixf1=dict(_PROD, newton_residual="mixed", mg_fine_smooth_degree=1),
    prodflat=dict(_PROD, newton_residual="mixed", mg_level_backend="stencil_flat"),
    prodflatx=dict(_PROD, newton_residual="mixed", mg_level_backend="stencil_flatx"),
    # shift smoothing work from the expensive Q2 fine level to the cheap
    # Q1 levels (fine ops are ~2x a Q1 level op and the autotuned Q1
    # backend widens that): iteration counts for these are measured on
    # CPU (hardware-independent), wall times on TPU
    prodf1q4=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        mg_smooth_degree=4,
    ),
    prodf1q5=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        mg_smooth_degree=5,
    ),
    prodf0q4=dict(
        _PROD, newton_residual="mixed", mg_skip_fine_smoothing=True,
        mg_smooth_degree=4,
    ),
    prodf0q6=dict(
        _PROD, newton_residual="mixed", mg_skip_fine_smoothing=True,
        mg_smooth_degree=6,
    ),
    # A/B the fine-level smoothing operator: exact assembled tangent
    # (default) vs the constant small-strain proxy
    prodnoft=dict(_PROD, newton_residual="mixed", mg_fine_tangent=False),
    prodft=dict(_PROD, newton_residual="mixed", mg_fine_tangent=True),
    # round-4 tangent A/B matrix on the bench config (mixed residual,
    # fine degree 1): bf16 single-pass assembly and/or block-symmetric
    # storage — the two staged levers against the 215 ms/step assembly +
    # 113 ms/step matvec blocks in the round-4 profile
    prodpd=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_assembly_precision="default",
    ),
    prodsym=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_block_symmetric=True,
    ),
    prodsympd=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_block_symmetric=True, tangent_assembly_precision="default",
    ),
    # "high" = 3-pass bf16x3 assembly (~19-bit significand): the halfway
    # point after "default" (1 pass) measured divergent on hardware
    prodhigh=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_assembly_precision="high",
    ),
    prodsymhigh=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_block_symmetric=True, tangent_assembly_precision="high",
    ),
    # pack-free block-ref Pallas matvec (vs the packed default)
    prodblocks=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_matvec_kernel="blocks",
    ),
    prodsymblocks=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        tangent_block_symmetric=True, tangent_matvec_kernel="blocks",
    ),
    # round-5: modified-Newton tangent reuse (freeze the assembled
    # tangent after iteration `tangent_reuse_after`, non-acceleration
    # refresh safeguard) — attacks the largest round-4 profile block
    # (per-iteration assembly, 43 ms x ~5 its at 1M DoF)
    prodreuse=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        newton_tangent_reuse=True,
    ),
    prodreuse2=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        newton_tangent_reuse=True, tangent_reuse_after=2,
    ),
    prodreusesym=dict(
        _PROD, newton_residual="mixed", mg_fine_smooth_degree=1,
        newton_tangent_reuse=True, tangent_block_symmetric=True,
    ),
    # f64-handback window of the mixed residual schedule
    prodw100=dict(_PROD, newton_residual="mixed", newton_residual_f64_window=100.0),
    prodw300=dict(_PROD, newton_residual="mixed", newton_residual_f64_window=300.0),
    # FIXED forcing on the production config: every Newton solve runs to
    # rel tol_lin=1e-6, so cg/newton directly measures preconditioner
    # h-(in)dependence with no Eisenstat-Walker truncation masking it
    # (round-4: resolves the PERFORMANCE.md 46->65 its/solve note, which
    # was measured on the pre-semi-coarsening isotropic hierarchy)
    prodfixed=dict(
        _PROD, newton_residual="mixed", newton_forcing="fixed",
        mg_fine_smooth_degree=1,
    ),
    # round-5 drift diagnosis (verdict #9): the fixed-forcing study
    # measured +21% CG its/solve over 72x DoF (15.3 -> 18.5). Separate
    # coarse-solve quality from smoother strength: if q5 (stronger
    # Chebyshev smoothing on every level) flattens the drift but c32k
    # (8x bigger dense-Cholesky coarse base) does not, the drift is
    # smoother-limited, and vice versa.
    prodfixedq5=dict(
        _PROD, newton_residual="mixed", newton_forcing="fixed",
        mg_fine_smooth_degree=1, mg_smooth_degree=5,
    ),
    prodfixedf3=dict(
        _PROD, newton_residual="mixed", newton_forcing="fixed",
        mg_fine_smooth_degree=3,
    ),
    prodfixedc32k=dict(
        _PROD, newton_residual="mixed", newton_forcing="fixed",
        mg_fine_smooth_degree=1, mg_coarse_size=32000,
    ),
)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or ["mg2", "mg3", "mg4"]
    for name in names:
        try:
            r = run_variant(scale, **VARIANTS[name])
            print(f"{name:10s} scale={scale}: {r}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} scale={scale}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
