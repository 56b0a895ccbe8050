#!/usr/bin/env python
"""Microbenchmark the Q1 structured-operator backends on the MG level
shapes of the 1M-DoF bench (FEM-SEM Q1 level = the dominant V-cycle op).

Usage: python tools/op_bench.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dealii_adapter_tpu  # noqa: F401

from dealii_adapter_tpu.fem.dofspace import DofSpace
from dealii_adapter_tpu.mesh.generator import subdivided_hyper_rectangle
from dealii_adapter_tpu.ops.element_ops import ElementMatrices
from dealii_adapter_tpu.ops.pallas_structured import (
    make_pallas_q1_operator,
    make_pallas_q1_slab_operator,
)
from dealii_adapter_tpu.ops.structured import make_structured_operator


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


def timeit(fn, u, n=30):
    """Time one operator application via a chain of n dependent
    applications inside a single jit (the axon tunnel pipelines/elides
    repeated identical dispatches, so unchained timings are meaningless)."""

    def chain(v):
        for _ in range(n):
            v = fn(v)
        return v

    g = jax.jit(chain)
    r = g(u)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = g(u)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    # FEM-SEM Q1 level of the PF 3D Q2 bench mesh: reps*2 cells per axis
    reps = (3 * scale * 2, 18 * scale * 2, 1 * scale * 2)
    mesh = subdivided_hyper_rectangle(
        reps, (0.0, 0.0, 0.0), (0.1, 1.0, 0.3), 1
    )
    space = DofSpace.create(mesh)
    elem = ElementMatrices(space, 1.5e6, 0.5e6, 1000.0)
    E = elem.K_e + 1e4 * elem.M_e
    n = space.n_nodes
    print(f"Q1 level lattice {tuple(reversed([r+1 for r in reps]))} "
          f"= {n} nodes, {n*3} DoF")

    from dealii_adapter_tpu.ops.stencil import make_q1_stencil_operator

    for dtype, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        u = jax.random.normal(jax.random.PRNGKey(0), (n, 3)).astype(dtype)
        op = make_structured_operator(space, E, dtype, "default")
        xla = lambda v: op(v)
        t = timeit(xla, u)
        bw = 2 * n * 3 * u.dtype.itemsize / t / 1e9
        print(f"  XLA structured {name}: {t*1e3:8.3f} ms  ({bw:6.1f} GB/s eff)")
        for strat in ("shift", "conv", "banded", "flat", "flatx"):
            st = make_q1_stencil_operator(space, E, dtype, strategy=strat)
            sten = lambda v, st=st: st(v)
            try:
                t = timeit(sten, u)
            except Exception as e:  # noqa: BLE001
                print(f"  stencil {strat:<7}{name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            bw = 2 * n * 3 * u.dtype.itemsize / t / 1e9
            print(f"  stencil {strat:<7}{name}: {t*1e3:8.3f} ms  "
                  f"({bw:6.1f} GB/s eff)")
        if jax.default_backend() == "tpu":
            try:
                p1 = make_pallas_q1_operator(space, E, dtype)
                pal1 = lambda v: p1(v)
                t = timeit(pal1, u)
                bw = 2 * n * 3 * u.dtype.itemsize / t / 1e9
                print(f"  pallas plane   {name}: {t*1e3:8.3f} ms  ({bw:6.1f} GB/s eff)")
            except Exception as e:  # noqa: BLE001
                print(f"  pallas plane   {name}: FAILED {type(e).__name__}")
            for slab in (2, 4, 8, 16):
                try:
                    p2 = make_pallas_q1_slab_operator(space, E, dtype, slab=slab)
                    pal2 = lambda v, p2=p2: p2(v)
                    t = timeit(pal2, u)
                    bw = 2 * n * 3 * u.dtype.itemsize / t / 1e9
                    print(f"  pallas slab-{slab:<2} {name}: {t*1e3:8.3f} ms  "
                          f"({bw:6.1f} GB/s eff)")
                except Exception as e:  # noqa: BLE001
                    print(f"  pallas slab-{slab:<2} {name}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
