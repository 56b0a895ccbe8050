"""Latency-cancelled on-device operator timing.

The axon TPU tunnel adds a large, noisy fixed round trip to every
dispatch (round-3 hardware logs: 7.7-12.7 ms/apply readings for ops whose
real cost is 0.07 ms, with run-to-run winner swaps). The estimator here
times a LONG and a SHORT chain of dependent applications and divides the
difference — the fixed per-call cost cancels, the chain spread divides
the residual noise.

Chains are `lax.scan` loops, not Python unrolls: XLA compiles the body
ONCE per chain (round-4 forensics: unrolled 26-long chains of 1M-DoF
operators dominated autotune setup time on a cold cache).
"""

import time

import jax
import jax.numpy as jnp


def time_op_on_device(
    op,
    n_nodes: int,
    dim: int,
    dtype,
    chain: int = 6,
    chain_long: int = 26,
    reps: int = 3,
) -> float:
    """Seconds per application of `op` ((n_nodes, dim) -> same), measured
    chain-differenced with result-derived host readbacks (an async
    dispatch hole cannot fake completion — round-2 lesson)."""
    u = jnp.zeros((n_nodes, dim), dtype=dtype)

    def make(n):
        def chained(v):
            # type-stable carry: ops may accumulate in a wider dtype
            return jax.lax.scan(
                lambda c, _: (op(c).astype(c.dtype), None), v, None, length=n
            )[0]

        g = jax.jit(chained)
        r = g(u)
        jax.block_until_ready(r)
        float(jnp.vdot(r[0].astype(jnp.float32), r[0].astype(jnp.float32)))

        def run():
            t0 = time.perf_counter()
            out = g(u)
            jax.block_until_ready(out)
            float(
                jnp.vdot(
                    out[0].astype(jnp.float32), out[0].astype(jnp.float32)
                )
            )
            return time.perf_counter() - t0

        return run

    run_s, run_l = make(chain), make(chain_long)
    t_s = min(run_s() for _ in range(reps))
    t_l = min(run_l() for _ in range(reps))
    t_op = (t_l - t_s) / (chain_long - chain)
    # a non-positive difference means the op is under the timer noise;
    # fall back to the optimistic long-chain mean
    return t_op if t_op > 0 else t_l / chain_long


__all__ = ["time_op_on_device"]
