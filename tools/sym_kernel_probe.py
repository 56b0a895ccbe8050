#!/usr/bin/env python
"""Standalone compile probe for the block-symmetric tangent Pallas kernel.

The round-4 sweep saw its build-time probe fail through the axon tunnel
with an opaque `HTTP 500: tpu_compile_helper subprocess exit code 1` (the
remote compile helper crashed), which could be either a tunnel flake or a
real Mosaic lowering failure. This drives the kernel directly at a ladder
of shapes so the failure (if real) is reproducible and shape-attributable.

    python tools/sym_kernel_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dealii_adapter_tpu  # noqa: F401  (x64 config)
import jax
import jax.numpy as jnp

from dealii_adapter_tpu.ops.assembled_tangent import (
    apply_packed_tangents_pallas,
    apply_packed_tangents_sym_pallas,
    upper_blocks,
)


def main():
    print(jax.devices())
    dim, npc = 3, 27  # Q2 3D
    nb = len(upper_blocks(dim))
    for name, bc, dt in [
        ("sym f32 bc=128", 128, jnp.float32),
        ("sym f32 bc=512", 512, jnp.float32),
        ("sym bf16 bc=512", 512, jnp.bfloat16),
        ("full f32 bc=512 (control)", 512, jnp.float32),
        ("full bf16 bc=512", 512, jnp.bfloat16),
    ]:
        try:
            u = jnp.zeros((dim * npc, bc), dtype=jnp.float32)
            if name.startswith("sym"):
                k = jnp.zeros((nb * npc, npc, bc), dtype=dt)
                out = apply_packed_tangents_sym_pallas(k, u, dim, npc, bc)
            else:
                k = jnp.zeros((dim * npc, dim * npc, bc), dtype=dt)
                out = apply_packed_tangents_pallas(k, u, bc)
            jax.block_until_ready(out)
            print(f"OK   {name}: out {out.shape} {out.dtype}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
