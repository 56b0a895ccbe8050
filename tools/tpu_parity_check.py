#!/usr/bin/env python
"""Compiled-kernel parity check on real TPU hardware.

The test suite runs on a virtual CPU mesh (tests/conftest.py), so the
COMPILED Pallas kernels (Q1 slab, Q1 whole-field-VMEM stencil, Q2
phase-split) are only ever exercised in interpret mode there. This tool
closes that gap: on the real chip it compares every compiled TPU kernel
against the plain XLA structured formulation on random input at
bench-representative shapes, and fails loudly on mismatch.

Run in every hardware session (tools/tpu_round4_ab.sh does); paste the
output into PERFORMANCE.md's hardware-session notes.

Tolerances: the Pallas kernels accumulate in f32 while the XLA
reference here runs the same f32 arithmetic with `highest` precision;
agreement is expected to ~1e-5 relative (f32 rounding over 81-wide
element rows), and bf16 I/O to ~2e-2.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _rel_err(a, b):
    import jax.numpy as jnp

    denom = float(jnp.max(jnp.abs(b)))
    return float(jnp.max(jnp.abs(a - b))) / max(denom, 1e-30)


def main():
    import dealii_adapter_tpu  # noqa: F401  (x64 config)
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dealii_adapter_tpu.fem.dofspace import DofSpace
    from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
    from dealii_adapter_tpu.ops.element_ops import ElementMatrices
    from dealii_adapter_tpu.ops.structured import make_structured_operator

    if jax.default_backend() != "tpu":
        print("tpu_parity_check: not on TPU, nothing to check", file=sys.stderr)
        return 0

    failures = []

    def check(name, op, ref, n_nodes, dim, dtype, tol):
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, (n_nodes, dim), dtype=jnp.float32).astype(dtype)
        t0 = time.perf_counter()
        # lambda-wrap: operator objects holding device arrays are not
        # hashable, which jax.jit requires of its callable
        out = jax.jit(lambda x: op(x))(u)
        jax.block_until_ready(out)
        r = jax.jit(lambda x: ref(x))(u.astype(jnp.float32))
        jax.block_until_ready(r)
        err = _rel_err(out.astype(jnp.float32), r)
        ok = err < tol
        print(
            f"{name}: rel_err={err:.3e} tol={tol:.0e} "
            f"{'OK' if ok else 'FAIL'} ({time.perf_counter() - t0:.1f}s)"
        )
        if not ok:
            failures.append(name)

    # --- Q2 phase-split kernel at a bench-like anisotropic shape ---------
    from dealii_adapter_tpu.ops.pallas_phase import (
        make_pallas_q2_operator,
        pallas_q2_supported,
    )

    mesh = subdivided_hyper_rectangle((45, 15, 5), (0, 0, 0),
                                      (0.35, 0.11, 0.04), 2)
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    E = np.asarray(elem.K_e + 3.3 * elem.M_e)
    ref = make_structured_operator(space, E, jnp.float32, precision="highest")
    if pallas_q2_supported(space, jnp.float32):
        for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
            op = make_pallas_q2_operator(space, E, dtype)
            check(f"q2_phase[{jnp.dtype(dtype).name}]", op, ref,
                  space.n_nodes, 3, dtype, tol)
    else:
        print("q2_phase: unsupported on this backend", file=sys.stderr)
        failures.append("q2_phase_unsupported")

    # --- Q1 kernels at an MG-level-like shape -----------------------------
    from dealii_adapter_tpu.ops.pallas_structured import (
        make_pallas_q1_slab_operator,
        pallas_q1_supported,
    )
    from dealii_adapter_tpu.ops.stencil import make_q1_stencil_operator

    mesh1 = subdivided_hyper_rectangle((90, 30, 10), (0, 0, 0),
                                       (0.35, 0.11, 0.04), 1)
    space1 = DofSpace.create(mesh1)
    elem1 = ElementMatrices(space1, 2e6, 0.5e6, 1000.0)
    E1 = np.asarray(elem1.K_e + 3.3 * elem1.M_e)
    ref1 = make_structured_operator(space1, E1, jnp.float32,
                                    precision="highest")
    if pallas_q1_supported(space1, jnp.float32):
        for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
            op = make_pallas_q1_slab_operator(space1, E1, dtype, slab=4)
            check(f"q1_slab[{jnp.dtype(dtype).name}]", op, ref1,
                  space1.n_nodes, 3, dtype, tol)
    else:
        print("q1_slab: unsupported on this backend", file=sys.stderr)
        failures.append("q1_slab_unsupported")

    # banded/conv run their contraction on the MXU at DEFAULT precision
    # (one bf16 pass, ~4e-3 rel — measured 3.98e-3 on v5e): deliberate,
    # they are MG-level operators inside the bf16/f32 preconditioner.
    # The elementwise-FMA strategies (vmem/flat*/shift) are true f32.
    mxu_default = {"banded", "conv"}
    for strat in ("vmem", "banded", "flatx", "flat", "conv", "shift"):
        tol = 2e-2 if strat in mxu_default else 1e-4
        try:
            op = make_q1_stencil_operator(space1, E1, jnp.float32,
                                          strategy=strat)
            check(f"q1_stencil_{strat}[f32]", op, ref1,
                  space1.n_nodes, 3, jnp.float32, tol)
        except Exception as e:  # noqa: BLE001
            print(f"q1_stencil_{strat}: build failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            failures.append(f"q1_stencil_{strat}_build")

    if failures:
        print(f"tpu_parity_check: FAILED {failures}", file=sys.stderr)
        return 1
    print("tpu_parity_check: all compiled kernels match XLA")
    return 0


if __name__ == "__main__":
    sys.exit(main())
