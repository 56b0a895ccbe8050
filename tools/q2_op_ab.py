#!/usr/bin/env python
"""A/B the MG fine-level Q2 proxy operator backends on real hardware:
phase-split Pallas kernel (ops/pallas_phase.py) vs the XLA structured
formulation, latency-cancelled, at the bench fine-level shape.

Usage: python tools/q2_op_ab.py [scale] [dtype]
(defaults: scale 9 = the 1.02M-DoF bench lattice, bfloat16 = the
V-cycle hierarchy dtype)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dealii_adapter_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def time_chained(fn, zero, n_short=2, n_long=12, reps=5):
    def make(n):
        def chained(x):
            return jax.lax.scan(
                lambda c, _: (fn(c).astype(c.dtype), None), x, None, length=n
            )[0]

        g = jax.jit(chained)
        out = g(zero)
        jax.block_until_ready(out)
        float(jnp.vdot(out[0].astype(jnp.float32), out[0].astype(jnp.float32)))

        def run():
            t0 = time.perf_counter()
            r = g(zero)
            jax.block_until_ready(r)
            float(jnp.vdot(r[0].astype(jnp.float32), r[0].astype(jnp.float32)))
            return time.perf_counter() - t0

        return run

    rs, rl = make(n_short), make(n_long)
    ts = min(rs() for _ in range(reps))
    tl = min(rl() for _ in range(reps))
    t = (tl - ts) / (n_long - n_short)
    return t if t > 0 else tl / n_long


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    dtype = jnp.dtype(sys.argv[2] if len(sys.argv) > 2 else "bfloat16")

    from dealii_adapter_tpu.fem.dofspace import DofSpace
    from dealii_adapter_tpu.mesh.generator import make_scenario_grid
    from dealii_adapter_tpu.ops.element_ops import ElementMatrices
    from dealii_adapter_tpu.ops.pallas_phase import (
        make_pallas_q2_operator,
        pallas_q2_supported,
    )
    from dealii_adapter_tpu.ops.structured import make_structured_operator

    mesh, _ = make_scenario_grid("PF", 3, 2, scale=scale, solver="neo-Hookean")
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 2e6, 0.5e6, 1000.0)
    E = np.asarray(elem.K_e + 3.3 * elem.M_e)
    print(f"{space.n_nodes} nodes ({space.n_dofs} DoF), dtype={dtype}")

    zero = jnp.zeros((space.n_nodes, 3), dtype=dtype)
    xla_op = make_structured_operator(space, E, dtype, precision="default")
    t_xla = time_chained(lambda v: xla_op(v), zero)
    print(f"xla_structured: {t_xla * 1e3:.3f} ms/apply")

    if pallas_q2_supported(space, dtype):
        for slab in (1, 2, 4):
            op = make_pallas_q2_operator(space, E, dtype, slab=slab)
            t = time_chained(lambda v: op(v), zero)
            print(f"pallas_phase slab={slab}: {t * 1e3:.3f} ms/apply")
    else:
        print("pallas_phase: unsupported here")


if __name__ == "__main__":
    main()
