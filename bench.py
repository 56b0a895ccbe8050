#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line.

Metric (BASELINE.md north star): MDoF * Newmark-steps / second per chip on
the 3D nonlinear (finite-strain Neo-Hookean) perpendicular-flap at ~1M DoF,
Newton-Krylov with matrix-free Jacobi-preconditioned CG at the reference's
tolerances (tol_u=1e-6, tol_f=1e-9 relative; float64).

`vs_baseline` is throughput relative to the north-star stand-in for the
reference's 16-core CPU run (BASELINE.md:27). The reference binary cannot
run in this image (deal.II is not installable), and the bench host exposes
a limited number of CPU cores, so the stand-in is constructed honestly in
two explicit steps recorded in `bench_baseline.json`:
  1. measure our own jitted step on the host CPU backend (XLA, all
     available cores; `cpu_mdof_steps_per_s`, `cpu_cores_measured`);
  2. extrapolate to 16 cores with IDEAL linear scaling
     (`cpu16_mdof_steps_per_s_est`) — an upper bound on any real 16-core
     run, making `vs_baseline` a CONSERVATIVE multiplier.
The JSON line also reports `vs_cpu_measured` (the raw measured-host
multiplier, the round-1 definition). Regenerate the baseline with
BENCH_MAKE_CPU_BASELINE=1 python bench.py.

Env knobs: BENCH_SCALE (mesh multiplier, default 9 -> ~1.02M DoF),
BENCH_STEPS (timed steps, default 3), BENCH_DTYPE, BENCH_DEGREE,
BENCH_MODEL ("nonlinear" default; "linear" benches the theta-scheme
linear-elastodynamics solver — BASELINE.md config 2: 3D Q2 ~100k DoF,
`ir_cg_solve` to the reference's absolute 1e-10 contract, default
BENCH_SCALE 4).

Cold-start contract (round-3 post-mortem): the run must land its JSON
inside the driver's ~30-minute window from a COLD compilation cache.
Everything answerable once per hardware (MG backend autotune winner,
guard component timings) persists to `.bench_autotune.json`
(utils/tunecache.py, committed) and is skipped on a hit
(BENCH_GUARD_REMEASURE=1 / MG_AUTOTUNE_REMEASURE=1 force re-measuring);
the metric JSON prints BEFORE the plausibility guard runs (a killed
guard must not erase a finished measurement — guard failure still
exits 3); all child output streams through line-by-line so a timeout
leaves a diagnostic tail; every phase logs a timestamped line.
"""

import json
import os
import sys
import time

_T0 = time.perf_counter()


def _log(msg):
    """Timestamped progress line on stderr: a driver-side timeout must
    leave an attributable trail of WHERE the run's time went (round-3
    driver bench died with an empty tail)."""
    print(f"bench[{time.perf_counter() - _T0:7.1f}s]: {msg}", file=sys.stderr)
    sys.stderr.flush()


def build_model(scale, dtype, degree, device_mesh=None):
    from dealii_adapter_tpu.config import AllParameters
    from dealii_adapter_tpu.mesh.generator import make_scenario_grid
    from dealii_adapter_tpu.models.nonlinear_elasticity import NonlinearElasticity

    params = AllParameters(
        model="neo-Hookean",
        type_lin="CG",
        scenario="PF",
        dim=3,
        poly_degree=degree,
        delta_t=0.01,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        tol_lin=1e-6,
        tol_u=1e-6,
        tol_f=1e-9,
        max_iterations_NR=10,
        max_iterations_lin=1.0,
        dtype=dtype,
        preconditioner=os.environ.get("BENCH_PRECOND", "MG"),
        # bf16 V-cycle inside the f32 tangent CG: measured identical outer
        # iteration counts/solutions vs f32/f64 hierarchies, less HBM traffic
        precond_dtype=os.environ.get("BENCH_PRECOND_DTYPE", "bfloat16"),
        # inexact Newton: the whole inner Krylov solve in f32, residual and
        # state in f64 (v5e emulates f64; see config.solve_dtype)
        solve_dtype=os.environ.get("BENCH_SOLVE_DTYPE", "float32"),
        # Eisenstat-Walker adaptive forcing + V(3,3): measured 88 vs 188
        # total CG its per step at 185k DoF with the same tol_u/tol_f
        newton_forcing=os.environ.get("BENCH_FORCING", "ew"),
        mg_smooth_degree=int(os.environ.get("BENCH_MG_DEGREE", "3")),
        # weaker fine-level smoothing (the FEM-SEM Q1 level overlaps the
        # fine smoother spectrally): f3 -> f2 measured 1.25 -> 1.07 s/step
        # at 1M (24 -> 25 its); f2 -> f1 costs +1 CG it at both 43k and
        # 185k DoF (CPU-measured, hardware-independent) for 2 fewer Q2
        # ops per V-cycle
        mg_fine_smooth_degree=int(os.environ.get("BENCH_MG_FINE_DEGREE", "1")),
        # Newmark constant-acceleration predictor start: measured 84 -> 73
        # total CG its/step at 185k DoF, identical trajectory
        newton_predictor=os.environ.get("BENCH_PREDICTOR", "1") == "1",
        # looser first-iteration Eisenstat-Walker forcing: 27 -> 24 CG
        # its/step at 1M with the semi-coarsened MG, same contract
        ew_eta0=float(os.environ.get("BENCH_EW_ETA0", "0.3")),
        # Pallas slab-fused Q1 operator inside the V-cycle (auto-falls back
        # to the XLA formulation off-TPU): 1.416 -> 1.247 s/step at 1M
        use_pallas=os.environ.get("BENCH_USE_PALLAS", "1") == "1",
        # opt-in: smooth the assembled tangent on the MG fine level (safe
        # at bench strains; see config.mg_fine_tangent caution)
        mg_fine_tangent=os.environ.get("BENCH_MG_FINE_TANGENT", "0") == "1",
        # per-Newton-iteration tangent assembly precision: "highest" =
        # true-f32 MXU passes (exact); "high" = 3-pass bf16x3 (A/B knob);
        # "default" (1 bf16 pass) measured DIVERGENT at scale 3 on v5e —
        # kappa(K) amplifies the post-cancellation entry error
        tangent_assembly_precision=os.environ.get(
            "BENCH_TANGENT_PRECISION", "highest"
        ),
        # upper-component-block tangent storage: 2/3 assembly matmuls +
        # 2/3 matvec HBM traffic, exactly symmetric operator (A/B knob)
        tangent_block_symmetric=os.environ.get("BENCH_TANGENT_SYM", "0")
        == "1",
        # Pallas matvec kernel choice: auto (packed-first) | blocks |
        # packed | xla (A/B knob for the pack-free block-ref kernel)
        tangent_matvec_kernel=os.environ.get("BENCH_TANGENT_KERNEL", "auto"),
        # modified Newton: freeze the assembled tangent after iteration 1
        # (refresh-on-stall safeguard) — skips the largest per-step cost
        # block (per-iteration assembly, 43 ms x ~5 its at 1M DoF)
        newton_tangent_reuse=os.environ.get("BENCH_TANGENT_REUSE", "0")
        == "1",
        # how many leading Newton iterations assemble fresh before the
        # freeze (round-5 hardware A/B: after=1 traded 3 skipped
        # assemblies for +1 Newton iteration and lost; after=2 keeps the
        # quadratic phase intact)
        tangent_reuse_after=int(
            os.environ.get("BENCH_TANGENT_REUSE_AFTER", "1")
        ),
        tangent_refresh_ratio=float(
            os.environ.get("BENCH_TANGENT_REFRESH_RATIO", "0.02")
        ),
        # mixed residual schedule: hand back to f64 within this multiple
        # of the measured f32 noise floor (A/B knob: the f64 residual is
        # the single largest per-step block at 1M DoF, 5 x 38.7 ms)
        newton_residual_f64_window=float(
            os.environ.get("BENCH_F64_WINDOW", "30.0")
        ),
        # sum-factorized f64 cell kernels (~13x fewer multiplies on the
        # emulated-f64 contractions that dominate the f64 residual)
        use_sumfact=os.environ.get("BENCH_SUMFACT", "0") == "1",
    )
    mesh, tags = make_scenario_grid(
        "PF", 3, degree, scale=scale, solver="neo-Hookean"
    )
    return NonlinearElasticity(params, mesh=mesh, tags=tags, device_mesh=device_mesh)


def build_linear_model(scale, dtype, degree, device_mesh=None):
    """BASELINE.md config 2: 3D linear flap, Q2, ~100k DoF (scale 4), the
    theta-scheme velocity solve of `linear_elasticity.cc:525-575` with the
    hardcoded ABSOLUTE 1e-10 CG contract (`linear_elasticity.cc:542-543`)
    met by f64 iterative refinement around f32 CG (`solvers/cg.py`)."""
    from dealii_adapter_tpu.config import AllParameters
    from dealii_adapter_tpu.mesh.generator import make_scenario_grid
    from dealii_adapter_tpu.models.linear_elasticity import LinearElastodynamics

    params = AllParameters(
        model="linear",
        type_lin="CG",
        scenario="PF",
        dim=3,
        poly_degree=degree,
        delta_t=0.005,
        theta=0.5,
        mu=0.5e6,
        nu=0.4,
        rho=1000.0,
        dtype=dtype,
        preconditioner=os.environ.get("BENCH_PRECOND", "MG"),
        precond_dtype=os.environ.get("BENCH_PRECOND_DTYPE", "bfloat16"),
        solve_dtype=os.environ.get("BENCH_SOLVE_DTYPE", "float32"),
        mg_smooth_degree=int(os.environ.get("BENCH_MG_DEGREE", "3")),
        mg_fine_smooth_degree=int(os.environ.get("BENCH_MG_FINE_DEGREE", "2")),
        use_pallas=os.environ.get("BENCH_USE_PALLAS", "1") == "1",
    )
    mesh, tags = make_scenario_grid("PF", 3, degree, scale=scale, solver="linear")
    return LinearElastodynamics(params, mesh=mesh, tags=tags, device_mesh=device_mesh)


def run_steps(model, n_steps, magnitude=1000.0):
    """Returns (wall seconds for n_steps, diagnostics).

    Timing is hardened against async-dispatch holes (round-2 verdict: the
    driver's run recorded a ~6700x-too-fast number because
    ``jax.block_until_ready`` returned early on the experimental axon
    backend): every timed step ends with a HOST READBACK of a scalar that
    is data-dependent on the step's output (``float(jnp.vdot(...))``
    cannot produce bytes on the host without the device execution having
    completed), and per-step wall times are recorded individually.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    stress_np = np.zeros((model.space.n_nodes, 3))
    iface = model.space.boundary_nodes[model.interface_id]
    stress_np[iface, 0] = magnitude
    stress = jnp.asarray(stress_np, dtype=model.dtype)

    state = model.initial_state()
    # warmup: compile + first step (excluded from timing)
    from dealii_adapter_tpu.utils.phases import phase

    phase("bench warmup (step compile)")
    _log("warmup step (compiles the full step program on a cache miss)...")
    state, info = model.step(state, stress)
    jax.block_until_ready(state)
    float(jnp.vdot(state.displacement, state.displacement))
    _log("warmup done; timing begins")

    phase("bench timed steps")
    diags = []
    step_times = []
    checksums = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        ts = time.perf_counter()
        state, info = model.step(state, stress)
        # host readback derived from the result: forces completion on
        # device AND transfer of the derived scalar before the clock stops
        checksums.append(float(jnp.vdot(state.displacement, state.displacement)))
        step_times.append(time.perf_counter() - ts)
        _log(f"timed step {i + 1}/{n_steps}: {step_times[-1]:.3f}s")
    elapsed = time.perf_counter() - t0
    diag = dict(
        max_u=float(jnp.max(jnp.abs(state.displacement))),
        step_times=[round(t, 4) for t in step_times],
        checksum=checksums[-1],
    )
    if hasattr(info, "cg_iterations"):  # nonlinear StepInfo
        diag.update(
            newton_its=int(info.iterations),
            cg_its=int(info.cg_iterations),
            converged=bool(info.converged),
            min_det_F=float(info.min_det_F),
            # true per-step cost mix (round-5): f64/f32 residual
            # evaluations actually paid and tangent assemblies run —
            # the step-time model must not assume "1 f64 + rest f32"
            f64_evals=int(info.f64_evals),
            f32_evals=int(info.f32_evals),
            tangent_asm=int(info.tangent_assemblies),
        )
    else:  # linear StepInfo: CG its + final absolute residual
        diag.update(
            newton_its=1,
            cg_its=int(info.iterations),
            residual=float(info.residual),
        )
    diags.append(diag)
    # NOTE: the plausibility guard is NOT run here — main() prints the
    # metric JSON first and runs the guard after (round-3 driver bench
    # died inside setup/guard compiles, erasing a finished measurement;
    # a killed guard must never erase the metric). Guard failure still
    # exits(3) before a 0 return code.
    return elapsed, diags, (model, state, stress)


def _time_chained(fn_of_x, zero, chain_short=2, chain_long=10, reps=5):
    """Latency-cancelled seconds per evaluation of `fn_of_x` (a
    field -> field function): time a long and a short chain of dependent
    applications inside one jit each and divide the difference.

    The axon tunnel adds a LARGE, NOISY round trip to every dispatch
    (measured on hardware: a chain of 1 and a chain of 40 applications
    of a 97k-DoF operator both take ~60 ms wall — the op itself is
    <0.5 ms and the rest is tunnel, with +-5 ms run-to-run noise even on
    a min of 5). A single-dispatch timing of a cheap component therefore
    measures the tunnel, not the op. The chain difference cancels the
    fixed per-call cost, and the chain spread (default 8) divides the
    residual noise to well under a ms/apply — enough for a ~2x-margin
    plausibility floor on multi-ms components. Each run is closed by a
    host readback of a result-derived scalar (round-2 lesson).

    The chains are `lax.scan` loops, NOT Python unrolls: XLA compiles the
    body ONCE per chain instead of inlining n copies. The round-4
    hardware session measured the unrolled 2/10 chains of the 1M-DoF f64
    residual still compiling after 19 minutes cold — the guard must never
    cost more than a couple of body compiles."""
    import jax
    import jax.numpy as jnp

    def make(n):
        def chained(x):
            # cast back to the carry dtype: scan needs a type-stable
            # carry, and e.g. the mixed-schedule f32 residual takes f32
            # in but accumulates its result in f64
            return jax.lax.scan(
                lambda c, _: (fn_of_x(c).astype(c.dtype), None),
                x, None, length=n,
            )[0]

        g = jax.jit(chained)
        out = g(zero)
        jax.block_until_ready(out)
        float(jnp.vdot(out[0], out[0]))

        def run():
            t0 = time.perf_counter()
            r = g(zero)
            jax.block_until_ready(r)
            float(jnp.vdot(r[0], r[0]))
            return time.perf_counter() - t0

        return run

    run_s, run_l = make(chain_short), make(chain_long)
    t_s = min(run_s() for _ in range(reps))
    t_l = min(run_l() for _ in range(reps))
    t = (t_l - t_s) / (chain_long - chain_short)
    # a non-positive difference means the op is under the timer noise;
    # fall back to the optimistic long-chain mean
    return t if t > 0 else t_l / chain_long


def _plausibility_guard(model, state, stress, diag, step_times):
    """Fail loudly if the measured per-step time is below a floor derived
    from independently timed solver components (round-2 verdict item 1:
    nothing used to cross-check elapsed-per-step against physics).

    A Newmark step provably contains >= newton_its residual evaluations,
    of which iteration 0 is always full-precision but — under the default
    mixed residual schedule — later iterations may run in the cheaper
    solve dtype. The floor is therefore one f64 evaluation plus
    (newton_its - 1) f32 evaluations, x0.5 generous safety margin for
    timer noise: a hard lower bound on any honest step time under EITHER
    schedule. For the linear model the bound is the cg_its Krylov
    operator applications of the theta-scheme solve. Component times are
    measured latency-cancelled (`_time_chained`) — the bench step is ONE
    dispatch, so its wall time must not be compared against floors that
    embed a per-dispatch tunnel round trip per component eval.

    Component times are a property of (device kind, model, shape, dtype),
    so they are persisted to the tunecache sidecar: a fresh process skips
    the chained-program compiles on a hit (round-3: the guard's cold
    compiles at 1M DoF helped kill the driver's run before any JSON was
    printed). BENCH_GUARD_REMEASURE=1 forces re-measurement.
    """
    import jax.numpy as jnp

    from dealii_adapter_tpu.utils import tunecache

    # Wall-clock budget for guard SETUP (compiles + measurements) on a
    # sidecar miss. The guard is belt-and-suspenders on top of the
    # per-step result-derived host readbacks in run_steps (which already
    # force real execution); it must never convert a finished honest
    # measurement into a driver timeout. Checked between component
    # measurements — worst case is budget + one scan-body compile.
    guard_budget = float(os.environ.get("BENCH_GUARD_BUDGET_S", "600"))
    guard_t0 = time.perf_counter()

    def over_budget(what):
        spent = time.perf_counter() - guard_t0
        if guard_budget > 0 and spent > guard_budget:
            print(
                f"bench guard: SKIPPED {what} — setup budget exhausted "
                f"({spent:.0f}s > {guard_budget:.0f}s). The metric stands "
                "on the per-step result-derived host readbacks; rerun with "
                "a higher BENCH_GUARD_BUDGET_S (or 0 = unlimited) to "
                "persist the floor to the sidecar.",
                file=sys.stderr,
            )
            return True
        return False

    zero = jnp.zeros_like(state.displacement)
    kind = "nonlinear" if hasattr(model, "residual") else "linear"
    skey = tunecache.hardware_key(
        "guard", kind, state.displacement.shape[0] * state.displacement.shape[1],
        str(jnp.dtype(model.dtype)), str(jnp.dtype(model.solve_dtype)),
    )
    cached = None
    if not os.environ.get("BENCH_GUARD_REMEASURE"):
        cached = tunecache.load("bench_guard", skey)
        if cached:
            _log(f"guard: sidecar hit ({skey})")

    if kind == "nonlinear":  # nonlinear: residual evaluations

        def res64(d):
            r, _ = model.residual(d, state, stress)
            return r

        n_evals = max(1, diag["newton_its"])
        if getattr(model, "_int_force32_J", None) is not None and n_evals > 1:
            # mixed schedule possible: count all but the iteration-0
            # anchor at the (cheaper) f32 evaluation cost. Round-4 verdict
            # (weak #5): a residual-only floor sat 22x under the honest
            # measurement — a half-broken run (Pallas silently off,
            # autotune mispick) passed trivially. When the assembled-
            # tangent + MG production path is active, the floor now also
            # counts the per-Newton tangent assemblies and the per-CG
            # tangent matvec + V-cycle applications, which puts it within
            # ~2-3x of honest.
            tangent_parts = bool(getattr(model, "_use_assembled", False))
            mg_parts = tangent_parts and model.params.preconditioner == "MG"
            need = ["t64_s", "t32_s"]
            if tangent_parts:
                need += ["t_asm_s", "t_mv_s"]
            if mg_parts:
                need += ["t_vc_s"]
            z32 = zero.astype(model.solve_dtype)
            if cached and all(k in cached for k in need):
                vals = {k: cached[k] for k in need}
            else:
                vals = dict(cached or {})

                def res32(d):
                    r, _ = model._residual32(d, state, stress)
                    return r

                if "t32_s" not in vals:
                    if over_budget("f32 residual floor measurement"):
                        return
                    vals["t32_s"] = _time_chained(
                        lambda d: res32(d.astype(z32.dtype)), z32
                    )
                if "t64_s" not in vals:
                    if over_budget("f64 residual floor measurement"):
                        return
                    vals["t64_s"] = _time_chained(res64, zero)
                # the tangent/V-cycle parts TIGHTEN the floor; an
                # infrastructure failure measuring them (e.g. a tunnel
                # compile-request limit) must degrade the floor to the
                # residual-only bound, not erase a finished measurement
                def try_measure(what, fn):
                    try:
                        fn()
                    except Exception as e:  # noqa: BLE001 - infra only
                        print(
                            f"bench guard: could not measure {what} "
                            f"({type(e).__name__}: {str(e)[:140]}); floor "
                            "degrades to the parts measured",
                            file=sys.stderr,
                        )

                if tangent_parts and (
                    "t_asm_s" not in vals or "t_mv_s" not in vals
                ):
                    if over_budget("tangent floor measurement"):
                        return
                    import jax

                    assemble_Kt, make_mv = model._make_tangent_fns()

                    def asm_field(u):
                        Kt = assemble_Kt(u)
                        # full reduction over every block defeats DCE of
                        # any part of the assembly (cost: one extra HBM
                        # read of K, small vs the assembly matmuls)
                        s = sum(
                            jnp.sum(leaf)
                            for leaf in jax.tree_util.tree_leaves(Kt)
                        )
                        return u + (s * 1e-30).astype(u.dtype)

                    def measure_tangent():
                        vals["t_asm_s"] = _time_chained(
                            asm_field, z32, chain_short=2, chain_long=6
                        )
                        # matvec timed INSIDE one program that assembles
                        # the tangent on-device: materializing Kt at the
                        # host boundary (closure constant OR explicit jit
                        # argument) exceeds the axon tunnel's compile-
                        # request limit at 1M DoF (HTTP 413, round-5).
                        # The chain difference cancels the one assembly.
                        import jax as _jx

                        def mv_chain(n):
                            def prog(u):
                                K32 = make_mv(assemble_Kt(u))
                                return _jx.lax.scan(
                                    lambda c, _: (
                                        K32(c).astype(c.dtype), None,
                                    ),
                                    u, None, length=n,
                                )[0]

                            g = _jx.jit(prog)
                            out = g(z32)
                            _jx.block_until_ready(out)

                            def run():
                                t0 = time.perf_counter()
                                r = g(z32)
                                _jx.block_until_ready(r)
                                float(jnp.vdot(r[0], r[0]))
                                return time.perf_counter() - t0

                            return run

                        rs, rl = mv_chain(2), mv_chain(12)
                        ts = min(rs() for _ in range(5))
                        tl = min(rl() for _ in range(5))
                        t = (tl - ts) / 10.0
                        vals["t_mv_s"] = t if t > 0 else tl / 12.0

                    try_measure("tangent assembly/matvec", measure_tangent)
                if mg_parts and "t_vc_s" not in vals:
                    if over_budget("V-cycle floor measurement"):
                        return
                    pdt = model._precond.dtype
                    try_measure(
                        "MG V-cycle",
                        lambda: vals.update(
                            t_vc_s=_time_chained(
                                lambda v: model._precond(
                                    v.astype(pdt)
                                ).astype(v.dtype),
                                z32,
                            )
                        ),
                    )
                tunecache.store("bench_guard", skey, vals)
            t64, t32 = vals["t64_s"], vals["t32_s"]
            # exact per-step evaluation mix when the model reports it
            # (NewtonInfo.f64_evals/f32_evals, round-5); otherwise the
            # conservative 1-f64-rest-f32 assumption
            n64_evals = max(1, diag.get("f64_evals", 1))
            n32_evals = max(0, diag.get("f32_evals", n_evals - 1))
            floor_s = n64_evals * t64 + n32_evals * t32
            detail = f"{n64_evals} f64 + {n32_evals} f32 residual evals"
            if tangent_parts and "t_asm_s" in vals and "t_mv_s" in vals:
                # modified Newton (tangent reuse) legitimately assembles
                # only once per step; a non-reuse run assembles every
                # Newton iteration. Use the reported count when present.
                n_asm = diag.get(
                    "tangent_asm",
                    1 if model.params.newton_tangent_reuse else n_evals,
                )
                cg_its = max(1, diag.get("cg_its", 1))
                per_cg = vals["t_mv_s"] + vals.get("t_vc_s", 0.0)
                floor_s += n_asm * vals["t_asm_s"] + cg_its * per_cg
                detail += (
                    f" + {n_asm} tangent asm x {vals['t_asm_s']*1e3:.1f} ms"
                    f" + {cg_its} CG its x {per_cg*1e3:.2f} ms (matvec"
                    + ("+V-cycle)" if "t_vc_s" in vals else ")")
                )
            floor = 0.5 * floor_s
            per_step = min(step_times)
            print(
                f"bench guard: t_f64={t64*1e3:.1f} ms, t_f32={t32*1e3:.1f} "
                f"ms, n_evals={n_evals}, floor={floor*1e3:.1f} ms/step "
                f"({detail} x 0.5 margin), measured "
                f"min={per_step*1e3:.1f} ms/step "
                f"(headroom {per_step/max(floor,1e-9):.1f}x)",
                file=sys.stderr,
            )
            if per_step < floor:
                print(
                    f"bench: FAILED plausibility guard — measured "
                    f"{per_step:.4f} s/step is below the component-derived "
                    f"floor {floor:.4f} s ({detail} x 0.5 margin). The "
                    "timing harness did not observe real execution; "
                    "refusing to report.",
                    file=sys.stderr,
                )
                sys.exit(3)
            return
        if cached and "t_component_s" in cached:
            t_res = cached["t_component_s"]
        else:
            if over_budget("f64 residual floor measurement"):
                return
            t_res = _time_chained(res64, zero)
            tunecache.store("bench_guard", skey, dict(t_component_s=t_res))
    else:  # linear: stepping-operator applications inside CG
        n_evals = max(1, diag["cg_its"])
        if cached and "t_component_s" in cached:
            t_res = cached["t_component_s"]
        else:
            if over_budget("stepping-operator floor measurement"):
                return
            zero = zero.astype(model.solve_dtype)
            t_res = _time_chained(model.A_lo, zero)
            tunecache.store("bench_guard", skey, dict(t_component_s=t_res))

    floor = 0.5 * n_evals * t_res
    per_step = min(step_times)
    print(
        f"bench guard: t_component={t_res*1e3:.1f} ms, n_evals={n_evals}, "
        f"floor={floor*1e3:.1f} ms/step, measured "
        f"min={per_step*1e3:.1f} ms/step",
        file=sys.stderr,
    )
    if per_step < floor:
        print(
            f"bench: FAILED plausibility guard — measured {per_step:.4f} "
            f"s/step is below the component-derived floor {floor:.4f} s "
            f"({n_evals} component evals x {t_res:.4f} s x 0.5 "
            "margin). The timing harness did not observe real execution; "
            "refusing to report.",
            file=sys.stderr,
        )
        sys.exit(3)


def _enable_compile_cache():
    """The axon-tunneled TPU pays ~8 min for the first compile in a fresh
    process; the persistent cache amortizes that across bench runs."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        # this image pre-imports jax via sitecustomize with the axon
        # platform pinned through jax.config, which OVERRIDES the env var;
        # honoring JAX_PLATFORMS here makes `JAX_PLATFORMS=cpu python
        # bench.py` actually run on CPU instead of hanging on the tunnel
        # (same bootstrap as tests/conftest.py)
        jax.config.update("jax_platforms", plat)


_WATCHDOG_OFF = False


def _start_phase_watchdog():
    """Heartbeat + deadline thread for the wedged-tunnel failure mode.

    Round-4 hardware sessions saw the remote compile service behind the
    axon tunnel WEDGE: a compile RPC that neither fails nor returns (the
    bench child sat 15+ min inside one setup phase at ~0% CPU). A hang
    is invisible to `_main_with_retry` (which classifies crashes), so the
    driver's outer timeout would kill the run at rc=124. This thread
    (a) prints a heartbeat naming the current phase every 60 s — a killed
    run's tail then shows exactly where the time went — and (b) aborts
    with the retryable exit code 75 when a single phase exceeds its
    deadline: setup phases are bounded by BENCH_PHASE_DEADLINE (default
    480 s; every measured legitimate setup phase is <4 min even cold),
    the one legitimately long phase — the step-program warmup compile,
    measured up to ~874 s cold — by BENCH_WARMUP_DEADLINE (default
    1500 s). The parent then re-execs a fresh child, which reuses
    whatever `.jax_cache`/sidecar progress the first attempt banked.
    Stands down once the metric JSON is printed (a finished measurement
    must never be erased by a wedged guard)."""
    import threading

    # resolve the import on the MAIN thread: an import inside the daemon
    # thread races the main thread's own package imports (observed: a
    # spurious partially-initialized-module ImportError in model build)
    from dealii_adapter_tpu.utils.phases import last_phase

    deadline = float(os.environ.get("BENCH_PHASE_DEADLINE", "480"))
    warm_deadline = float(os.environ.get("BENCH_WARMUP_DEADLINE", "1500"))

    def run():
        beat = 0.0
        while not _WATCHDOG_OFF:
            time.sleep(15)
            msg, elapsed = last_phase()
            lim = warm_deadline if "warmup" in msg else deadline
            beat += 15.0
            if beat >= 60.0:
                beat = 0.0
                _log(
                    f"heartbeat: in phase {msg!r} for {elapsed:.0f}s "
                    f"(deadline {lim:.0f}s)"
                )
            if elapsed > lim and not _WATCHDOG_OFF:
                _log(
                    f"phase {msg!r} exceeded its {lim:.0f}s deadline — "
                    "remote compile service presumed wedged; aborting "
                    "with retryable rc=75"
                )
                os._exit(75)

    threading.Thread(target=run, daemon=True).start()


def main():
    # attribute model-setup time phase-by-phase on stderr (round-4: the
    # warm-cache bench still spent most of its wall inside a single silent
    # "building model" line)
    os.environ.setdefault("DAT_PHASE_LOG", "1")
    import dealii_adapter_tpu  # noqa: F401  (x64 config)
    import jax

    _enable_compile_cache()

    # Mosaic health canary FIRST, before anything initializes this
    # process's TPU backend: the subprocess probe is only accurate
    # pre-attach (a canary child spawned after the parent holds a TPU
    # client hangs unconditionally — round-5 finding, utils/tunecache).
    # The memoized verdict then serves every lazy call site in setup.
    if os.environ.get("BENCH_USE_PALLAS", "1") == "1":
        from dealii_adapter_tpu.utils import tunecache as _tc

        _t0 = time.perf_counter()
        _log(
            f"mosaic canary (pre-attach): "
            f"{'healthy' if _tc.pallas_healthy() else 'DOWN'} "
            f"in {time.perf_counter() - _t0:.1f}s"
        )

    bench_model = os.environ.get("BENCH_MODEL", "nonlinear")
    assert bench_model in ("nonlinear", "linear"), bench_model
    build = build_model if bench_model == "nonlinear" else build_linear_model
    scale = int(
        os.environ.get("BENCH_SCALE", "9" if bench_model == "nonlinear" else "4")
    )
    n_steps = int(os.environ.get("BENCH_STEPS", "3"))
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    degree = int(os.environ.get("BENCH_DEGREE", "2"))

    baseline_path = os.path.join(
        os.path.dirname(__file__),
        "bench_baseline.json"
        if bench_model == "nonlinear"
        else "bench_baseline_linear.json",
    )

    if os.environ.get("BENCH_MAKE_CPU_BASELINE"):
        jax.config.update("jax_platforms", "cpu")
        cores = os.cpu_count() or 1
        model = build(scale, dtype, degree)
        mdof = model.space.n_dofs / 1e6
        elapsed, diags, _ = run_steps(model, max(1, n_steps))
        val = mdof * max(1, n_steps) / elapsed
        rec = dict(
            cpu_mdof_steps_per_s=val,
            cpu_cores_measured=cores,
            # ideal linear scaling to 16 cores: an upper bound on the real
            # 16-core reference run this proxy stands in for
            cpu16_mdof_steps_per_s_est=val * max(1.0, 16.0 / cores),
            n_dofs=model.space.n_dofs,
            scale=scale,
            dtype=dtype,
            degree=degree,
            steps=max(1, n_steps),
            seconds=elapsed,
            diags=diags,
            note="our jitted step on the bench host CPU backend (XLA, all "
            f"available cores = {cores}); the 16-core estimate assumes ideal "
            "linear scaling. The deal.II reference binary cannot run in this "
            "image, so this self-proxy is the only runnable baseline.",
        )
        with open(baseline_path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(json.dumps(rec), file=sys.stderr)
        return

    # heartbeat/deadline watchdog only for timed (driver-facing) runs:
    # baseline generation above runs local-CPU compiles with no tunnel
    # and no window, where a deadline would only false-trip
    _start_phase_watchdog()
    _log("building model (mesh/tabulation/MG setup)...")
    model = build(scale, dtype, degree)
    mdof = model.space.n_dofs / 1e6
    _log(
        f"model built: model={bench_model}, {model.space.n_dofs} DoF, "
        f"platform={jax.devices()[0].platform}, "
        f"dtype={dtype}, degree={degree}, steps={n_steps}"
    )
    elapsed, diags, guard_ctx = run_steps(model, n_steps)
    value = mdof * n_steps / elapsed
    print(f"diags: {diags}", file=sys.stderr)

    vs16 = 0.0
    vs_measured = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            base = json.load(fh)
        cpu1 = base.get("cpu_mdof_steps_per_s", 0.0)
        cores = base.get("cpu_cores_measured", 1)
        cpu16 = base.get(
            "cpu16_mdof_steps_per_s_est", cpu1 * max(1.0, 16.0 / cores)
        )
        if base.get("n_dofs") != model.space.n_dofs:
            print(
                f"bench: WARNING baseline n_dofs={base.get('n_dofs')} != "
                f"bench n_dofs={model.space.n_dofs}; vs_baseline mixes "
                "problem sizes (regenerate with BENCH_MAKE_CPU_BASELINE=1 "
                f"BENCH_SCALE={scale})",
                file=sys.stderr,
            )
        if cpu1:
            vs_measured = value / cpu1
        if cpu16:
            vs16 = value / cpu16

    print(
        json.dumps(
            {
                "metric": (
                    "nonlinear_flap_3d_mdof_newmark_steps_per_s"
                    if bench_model == "nonlinear"
                    else "linear_flap_3d_mdof_theta_steps_per_s"
                ),
                "value": round(value, 4),
                "unit": "MDoF*steps/s",
                # conservative: vs IDEAL 16-core scaling of the CPU proxy
                # (the north-star baseline, BASELINE.md:27)
                "vs_baseline": round(vs16, 3),
                # raw multiplier vs the measured CPU-backend proxy
                "vs_cpu_measured": round(vs_measured, 3),
                "s_per_step": round(elapsed / n_steps, 4),
                "n_dofs": model.space.n_dofs,
            }
        )
    )
    sys.stdout.flush()
    global _WATCHDOG_OFF
    _WATCHDOG_OFF = True
    # the guard runs AFTER the metric is on stdout: a timeout during its
    # (possibly cold) chained compiles must not erase the measurement.
    # An implausible measurement still fails the run: exit(3) turns the
    # already-printed JSON into a non-result for the driver.
    _log("metric printed; running plausibility guard")
    g_model, g_state, g_stress = guard_ctx
    _plausibility_guard(g_model, g_state, g_stress, diags[-1],
                        diags[-1]["step_times"])
    _log("guard passed")


def _run_streaming(cmd, env):
    """Run `cmd`, TEEING child stdout/stderr line-by-line to our own
    streams while accumulating them for failure-mode classification.

    Round-3 post-mortem: the previous `capture_output=True` buffered the
    child's entire output in this process, so when the driver's outer
    timeout killed the bench, every diagnostic line was lost and
    BENCH_r03.json recorded an EMPTY tail. Streaming guarantees that
    whatever the child printed before a kill is already in the driver's
    capture."""
    import subprocess
    import threading

    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, bufsize=1,
    )

    # If THIS supervisor is killed (driver timeout, operator Ctrl-C), the
    # worker must die with it: an orphaned worker keeps holding the TPU
    # client, and any other process's fresh Mosaic compile hangs for as
    # long as it lives (round-5 finding, utils/tunecache.mosaic_canary) —
    # an invisible way to wedge every subsequent run on the host.
    import atexit
    import signal

    def _reap(*_a):
        try:
            proc.kill()
        except Exception:  # noqa: BLE001 - already gone
            pass

    atexit.register(_reap)
    for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            _prev = signal.getsignal(_sig)

            def _h(sn, fr, _prev=_prev):
                _reap()
                if callable(_prev):
                    _prev(sn, fr)
                else:
                    raise SystemExit(128 + sn)

            signal.signal(_sig, _h)
        except (ValueError, OSError):  # non-main thread / exotic platform
            pass

    captured = {"out": [], "err": []}

    def pump(stream, sink, store):
        for line in iter(stream.readline, ""):
            sink.write(line)
            sink.flush()
            store.append(line)
        stream.close()

    threads = [
        threading.Thread(target=pump, args=(proc.stdout, sys.stdout, captured["out"])),
        threading.Thread(target=pump, args=(proc.stderr, sys.stderr, captured["err"])),
    ]
    for t in threads:
        t.daemon = True
        t.start()
    rc = proc.wait()
    for t in threads:
        t.join(timeout=10)
    return rc, "".join(captured["out"]) + "".join(captured["err"])


def _main_with_retry():
    """The axon-tunneled TPU occasionally drops an execution with
    UNAVAILABLE ('TPU worker process crashed or restarted'); the device
    recovers but the jax client process does not. Re-exec the bench in a
    fresh subprocess up to 2 times on that failure mode, streaming its
    output through (never buffering — see `_run_streaming`)."""
    if os.environ.get("BENCH_NO_RETRY"):
        main()
        return
    env = dict(os.environ, BENCH_NO_RETRY="1")
    transient = ("UNAVAILABLE", "TPU worker", "worker process crashed")
    last = 1
    for attempt in range(3):
        if attempt:
            print(f"bench: retry {attempt} after device fault", file=sys.stderr)
            time.sleep(20)
        # the child can see which attempt it is: the LAST attempt skips
        # optional setup measurements (e.g. the fine-proxy autotune takes
        # its measured prior) rather than risk dying in them again
        env["BENCH_ATTEMPT"] = str(attempt)
        env["BENCH_LAST_ATTEMPT"] = "1" if attempt == 2 else "0"
        last, blob = _run_streaming(
            [sys.executable, os.path.abspath(__file__)], env
        )
        if last == 0:
            return
        # rc=75: the child's phase watchdog detected a wedged remote
        # compile RPC and aborted — always worth one fresh attempt (the
        # retry reuses the .jax_cache/sidecar progress already banked)
        if last != 75 and not any(sig in blob for sig in transient):
            break  # deterministic failure (OOM, divergence, bad config)
    sys.exit(last)


if __name__ == "__main__":
    _main_with_retry()
