#!/usr/bin/env python
"""Component-level timing of the nonlinear Newmark step at bench scale.

Times each building block of the hot path separately (all jitted, warm):
f64 residual, f32 tangent action, MG V-cycle, a fixed-iteration CG — to
show where a step's wall time goes on the actual device. Usage:

    python tools/profile_step.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dealii_adapter_tpu  # noqa: F401  (x64 config)


def _enable_compile_cache():
    # persistent XLA compile cache (same dir bench.py uses): first compiles
    # at bench scale take minutes on the 1-core host, cached ones seconds
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    """Per-call seconds over a pipelined burst of identical dispatches.
    Amortizes (but does not cancel) the axon tunnel's per-dispatch round
    trip; use `timeit_chained` for cheap field->field components where
    the residual latency would dominate."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def timeit_chained(fn_of_x, zero):
    """Latency-cancelled per-application seconds of a field->field fn
    (long-minus-short dependent chains; see bench._time_chained)."""
    from bench import _time_chained

    return _time_chained(fn_of_x, zero)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from bench import build_model

    model = build_model(scale, "float64", 2)
    space = model.space
    print(f"n_dofs={space.n_dofs}, platform={jax.devices()[0].platform}")

    state = model.initial_state()
    stress_np = np.zeros((space.n_nodes, 3))
    stress_np[space.boundary_nodes[model.interface_id], 0] = 1000.0
    stress = jnp.asarray(stress_np, dtype=model.dtype)

    # f64 residual (latency-cancelled: the tunnel's per-dispatch round
    # trip is comparable to some of these components)
    zero = jnp.zeros((space.n_nodes, space.dim), dtype=model.dtype)
    t_res64 = t = timeit_chained(lambda d: model.residual(d, state, stress)[0], zero)
    print(f"f64 residual eval:        {t*1e3:9.2f} ms")

    # f32 tangent action (linearize once per Newton it, jvp per CG it)
    tdt = model.solve_dtype
    u_t = state.displacement.astype(tdt)
    v32 = jnp.ones((space.n_nodes, space.dim), dtype=tdt)

    if getattr(model, "_residual32", None) is not None:
        z32 = zero.astype(tdt)
        t_res32 = t = timeit_chained(
            lambda d: model._residual32(d.astype(tdt), state, stress)[0], z32
        )
        print(f"f32 residual eval:        {t*1e3:9.2f} ms")

    t = timeit_chained(
        lambda u: jax.linearize(model._int_force_t, u)[0], u_t
    )
    print(f"linearize primal (f32):   {t*1e3:9.2f} ms")

    def tangent_apply(u, v):
        _, jvp = jax.linearize(model._int_force_t, u)
        return jvp(v)

    tangent_jit = jax.jit(tangent_apply)
    t = timeit(tangent_jit, u_t, v32)
    print(f"linearize + 1 jvp (f32):  {t*1e3:9.2f} ms")

    def tangent_apply8(u, v):
        _, jvp = jax.linearize(model._int_force_t, u)
        for _ in range(8):
            v = jvp(v)
        return v

    t8 = timeit(jax.jit(tangent_apply8), u_t, v32)
    print(f"  -> marginal jvp:        {(t8 - t)/7*1e3:9.2f} ms")

    # assembled-tangent path (the bench's actual CG operator: materialize
    # per-cell tangents once per Newton iteration, then each CG matvec is
    # extract -> batched FMA sweep -> overlap-add)
    if getattr(model, "_use_assembled", False):
        from dealii_adapter_tpu.ops.assembled_tangent import (
            apply_cell_tangents,
            apply_packed_tangents_pallas,
            assemble_cell_tangents,
            pack_cell_tangents,
        )
        from dealii_adapter_tpu.ops.structured import (
            extract_cell_patches_T,
            overlap_add_T,
        )

        dim = space.dim
        deg = model.mesh.degree
        gs, rr = model._grid_shape, model._reps_rev

        def assemble(u):
            return assemble_cell_tangents(
                extract_cell_patches_T(u.reshape(gs + (dim,)), deg, rr),
                model._G_t, model._w_t, model.material,
                mass_term=model._tangent_mass,
            )

        asm_jit = jax.jit(assemble)
        t_asm = t = timeit(asm_jit, u_t)
        print(f"assemble cell tangents:   {t*1e3:9.2f} ms  (once per Newton it)")

        # IMPORTANT: the materialized tangent must be a runtime ARGUMENT
        # of the timed program, not a closure constant — a closed-over
        # ~1 GB array gets serialized into the axon remote-compile request
        # and the service rejects it (HTTP 413).
        Kc = asm_jit(u_t)
        npc_l = space.tab.n_nodes
        if model._tangent_pallas:
            bc = model._tangent_block_c
            pad = model._tangent_pad
            Kp = pack_cell_tangents(Kc)
            if pad:
                Kp = jnp.pad(Kp, ((0, 0), (0, 0), (0, pad)))

            def K32(Kp, v):
                pv = extract_cell_patches_T(v.reshape(gs + (dim,)), deg, rr)
                c = pv.shape[-1]
                p2 = pv.reshape(dim * npc_l, c)
                if pad:
                    p2 = jnp.pad(p2, ((0, 0), (0, pad)))
                o = apply_packed_tangents_pallas(Kp, p2, bc)[:, :c]
                return overlap_add_T(
                    o.reshape(dim, npc_l, c), deg, rr, gs
                ).reshape(-1, dim)

            K_arg = Kp
        else:

            def K32(Kc, v):
                pv = extract_cell_patches_T(v.reshape(gs + (dim,)), deg, rr)
                return overlap_add_T(
                    apply_cell_tangents(Kc, pv), deg, rr, gs
                ).reshape(-1, dim)

            K_arg = Kc

        def chained_K(n):
            def run(K, v):
                return jax.lax.scan(
                    lambda c, _: (K32(K, c).astype(c.dtype), None),
                    v, None, length=n,
                )[0]

            return jax.jit(run)

        g2, g12 = chained_K(2), chained_K(12)
        for g in (g2, g12):
            out = g(K_arg, v32)
            jax.block_until_ready(out)
            float(jnp.vdot(out[0], out[0]))

        def run_one(g):
            t0 = time.perf_counter()
            out = g(K_arg, v32)
            jax.block_until_ready(out)
            float(jnp.vdot(out[0], out[0]))
            return time.perf_counter() - t0

        t2 = min(run_one(g2) for _ in range(5))
        t12 = min(run_one(g12) for _ in range(5))
        t_mv = t = (t12 - t2) / 10 if t12 > t2 else t12 / 12
        print(f"assembled tangent matvec: {t*1e3:9.2f} ms  (once per CG it)")

        # pack + pad (runs once per Newton iteration inside the step):
        # ~2 extra full passes over the materialized tangent
        if model._tangent_pallas:

            def pack_pad(Kc):
                Kp = pack_cell_tangents(Kc)
                if pad:
                    Kp = jnp.pad(Kp, ((0, 0), (0, 0), (0, pad)))
                return Kp

            t_pack = t = timeit(jax.jit(pack_pad), Kc, n=5)
            print(f"tangent pack+pad:         {t*1e3:9.2f} ms  (once per Newton it)")

    # f64 state algebra bound: the Newmark/predictor updates are ~6
    # axpy-like passes over (n, dim) f64 vectors; this times exactly that
    # synthetic shape to bound what the step's non-solver algebra can cost
    def axpys(u, v):
        for k in range(6):
            u = u + (0.5 + k) * v
            v = v - 0.25 * u
        return u, v

    zf = jnp.zeros((space.n_nodes, space.dim), dtype=model.dtype)
    of = jnp.ones_like(zf)
    t_axpys = t = timeit(jax.jit(axpys), zf, of)
    print(f"12 f64 axpys @ (n,dim):   {t*1e3:9.2f} ms  (bounds Newmark algebra)")

    # f64 reduction (convergence norms: a few per Newton iteration)
    t_norm = t = timeit(jax.jit(lambda v: jnp.linalg.norm(v)), of)
    print(f"f64 norm @ (n,dim):       {t*1e3:9.2f} ms")

    # mass op f32
    if model.M_t is not None:
        t_mass = t = timeit_chained(model.M_t, v32)
        print(f"mass matvec (f32):        {t*1e3:9.2f} ms")

    # MG V-cycle
    if model._precond is not None:
        t_vc = t = timeit_chained(model._precond, v32)
        print(f"MG V-cycle (precond):     {t*1e3:9.2f} ms")

    # fixed 10-iteration CG on the constant mass-proxy operator (isolates
    # CG-loop overhead from operator cost)
    from dealii_adapter_tpu.solvers.cg import cg_solve

    def cg10(b):
        return cg_solve(
            lambda v: model.M_t(v) if model.M_t is not None else v,
            b, jnp.zeros_like(b), tol=0.0, max_iter=10,
        ).x

    t_cg10 = t = timeit(jax.jit(cg10), v32)
    print(f"10-it CG on mass (f32):   {t*1e3:9.2f} ms")

    # one full step for reference
    t_step = timeit(lambda: model.step(state, stress), n=2)
    print(f"full Newmark step:        {t_step*1e3:9.2f} ms")

    # ---- closed-form reconstruction (round-5): combine the chained
    # component timings with the step's OWN counters (NewtonInfo
    # f64/f32_evals + tangent_assemblies, exact — not the round-4
    # "1 f64 + rest f32" assumption) and print what remains
    # unattributed. This is the tool that locates the round-4 profile's
    # missing ~210 ms/step.
    _, info = model.step(state, stress)
    n64 = int(getattr(info, "f64_evals", info.iterations))
    n32 = int(getattr(info, "f32_evals", 0))
    nasm = int(getattr(info, "tangent_assemblies", info.iterations))
    newton = int(info.iterations)
    cg = int(info.cg_iterations)
    print(
        f"counters: newton={newton} cg={cg} f64_evals={n64} "
        f"f32_evals={n32} tangent_asm={nasm}"
    )
    loc = locals()
    t_res32_ = loc.get("t_res32", 0.0)
    t_asm_ = loc.get("t_asm", 0.0)
    t_mv_ = loc.get("t_mv", 0.0)
    t_pack_ = loc.get("t_pack", 0.0)
    t_vc_ = loc.get("t_vc", 0.0)
    t_mass_ = loc.get("t_mass", 0.0)
    cg_oh = max(t_cg10 - 10.0 * t_mass_, 0.0) / 10.0
    parts = [
        ("f64 residuals", n64 * t_res64),
        ("f32 residuals", n32 * t_res32_),
        ("tangent assemblies (+pack)", nasm * (t_asm_ + t_pack_)),
        ("CG matvecs", cg * t_mv_),
        ("CG V-cycles", cg * t_vc_),
        ("CG loop overhead", cg * cg_oh),
        ("norms (~3/newton it)", 3 * newton * t_norm),
        ("Newmark/predictor algebra", t_axpys),
    ]
    recon = sum(v for _, v in parts)
    print("reconstruction from counters x chained components:")
    for name, v in parts:
        print(f"  {name:28s} {v*1e3:9.2f} ms")
    print(f"  {'RECONSTRUCTED':28s} {recon*1e3:9.2f} ms")
    print(f"  {'MEASURED step':28s} {t_step*1e3:9.2f} ms")
    print(
        f"  {'UNATTRIBUTED':28s} {(t_step - recon)*1e3:9.2f} ms "
        f"({(t_step - recon)/t_step*100:.1f}% of step)"
    )


if __name__ == "__main__":
    main()
