#!/usr/bin/env python
"""Sub-component attribution of the per-Newton tangent assembly and of a
full CG solve at bench scale.

The round-4 step profile (tools/profile_step.py) leaves ~255 ms/step of
the measured 820 ms unattributed, and shows `assemble cell tangents` at
43 ms/eval — ~9x the MXU bound of its matmuls, so the cost must sit in
the A-tensor materialization / layout moves, not the contractions. This
tool times the assembly pipeline stage by stage and a standalone
fixed-iteration CG solve so the missing step time can be located:

    python tools/profile_assembly.py [scale]

Stages (all jitted, warm, latency-cancelled where field->field):
  1. extract_cell_patches_T            (input gather)
  2. piola_tangent_c                   (pointwise dP/dF, (81, q, c) write)
  3. piola + transpose to (d,e,d2q,c)  (the layout move the matmuls need)
  4. full assemble_cell_tangents       (matmuls + symmetrization + mass)
  5. standalone 10-iteration CG on the assembled tangent with the real
     MG preconditioner (chained; compared against 10x the per-component
     sum to expose in-situ-vs-isolated costs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dealii_adapter_tpu  # noqa: F401  (x64 config)


def _enable_compile_cache():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # host readback of a result-derived scalar closes the async pipeline
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.vdot(leaf.ravel()[:8], leaf.ravel()[:8]))
    return (time.perf_counter() - t0) / n


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from bench import build_model

    from dealii_adapter_tpu.ops.assembled_tangent import (
        assemble_cell_tangents,
        pack_cell_tangents,
        piola_tangent_c,
    )
    from dealii_adapter_tpu.ops.structured import extract_cell_patches_T

    model = build_model(scale, "float64", 2)
    space = model.space
    dim = space.dim
    deg = model.mesh.degree
    gs, rr = model._grid_shape, model._reps_rev
    print(f"n_dofs={space.n_dofs}, platform={jax.devices()[0].platform}")

    tdt = model.solve_dtype
    u_t = model.initial_state().displacement.astype(tdt)
    pad = getattr(model, "_tangent_pad", 0)

    def extract(u):
        p = extract_cell_patches_T(u.reshape(gs + (dim,)), deg, rr)
        return jnp.pad(p, ((0, 0), (0, 0), (0, pad))) if pad else p

    ext_jit = jax.jit(extract)
    t_ext = timeit(ext_jit, u_t)
    print(f"extract+pad patches:      {t_ext*1e3:9.2f} ms")
    ut_p = ext_jit(u_t)

    G, w = model._G_t, model._w_t
    q = G.shape[0]
    npc = space.tab.n_nodes

    def grad_of(ut):
        return [
            [
                jnp.dot(G[:, :, e], ut[d], preferred_element_type=ut.dtype)
                for e in range(dim)
            ]
            for d in range(dim)
        ]

    def stage_piola(ut):
        return piola_tangent_c(grad_of(ut), model.material)

    t_pi = timeit(jax.jit(stage_piola), ut_p, n=5)
    print(f"grad + piola_tangent_c:   {t_pi*1e3:9.2f} ms  (A materialize)")

    def stage_transpose(ut):
        c = ut.shape[-1]
        A = piola_tangent_c(grad_of(ut), model.material)
        A = A.reshape(dim, dim, dim, dim, q, c)
        return A.transpose(0, 2, 1, 3, 4, 5).reshape(dim, dim, dim * dim * q, c)

    t_tr = timeit(jax.jit(stage_transpose), ut_p, n=5)
    print(f"  + transpose to (d,e,:):  {t_tr*1e3:8.2f} ms  "
          f"(layout move: {max(t_tr - t_pi, 0)*1e3:.2f})")

    def stage_full(ut):
        return assemble_cell_tangents(
            ut, G, w, model.material, mass_term=model._tangent_mass
        )

    t_asm = timeit(jax.jit(stage_full), ut_p, n=5)
    print(f"full assemble:            {t_asm*1e3:9.2f} ms  "
          f"(matmuls+sym+mass: {max(t_asm - t_tr, 0)*1e3:.2f})")

    def stage_packed(ut):
        return pack_cell_tangents(
            assemble_cell_tangents(
                ut, G, w, model.material, mass_term=model._tangent_mass
            )
        )

    t_pk = timeit(jax.jit(stage_packed), ut_p, n=5)
    print(f"  + pack:                  {t_pk*1e3:8.2f} ms  "
          f"(pack pass: {max(t_pk - t_asm, 0)*1e3:.2f})")

    # ---- standalone fixed-iteration CG on the real operator/preconditioner
    # (exposes in-situ costs the isolated component timings miss)
    if not getattr(model, "_use_assembled", False):
        print("assembled tangent off; skipping CG stage")
        return
    state = model.initial_state()
    stress_np = np.zeros((space.n_nodes, dim))
    stress_np[space.boundary_nodes[model.interface_id], 0] = 1000.0
    stress = jnp.asarray(stress_np, dtype=model.dtype)

    t0 = time.perf_counter()
    state2, info = model.step(state, stress)
    float(jnp.vdot(state2.displacement, state2.displacement))
    t_warm = time.perf_counter() - t0
    newton = int(info.iterations)
    cg = int(info.cg_iterations)

    reps = 3
    t0 = time.perf_counter()
    st = state2
    for _ in range(reps):
        st, info2 = model.step(st, stress)
        float(jnp.vdot(st.displacement, st.displacement))
    t_step = (time.perf_counter() - t0) / reps
    print(
        f"full step:                {t_step*1e3:9.2f} ms  "
        f"({int(info2.iterations)} Newton / {int(info2.cg_iterations)} CG; "
        f"warm-call {t_warm:.1f}s)"
    )
    per_newton = [
        ("assemble+pack", t_pk),
        ("extract", t_ext),
    ]
    fixed = sum(t for _, t in per_newton) * int(info2.iterations)
    print(
        f"  accounted by this tool:  {fixed*1e3:8.2f} ms assembly-side "
        f"({int(info2.iterations)} Newton its) — remainder is CG loop + "
        "residuals + algebra (see profile_step.py)"
    )


if __name__ == "__main__":
    main()
