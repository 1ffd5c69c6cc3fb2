#!/usr/bin/env python
"""Driver benchmark: one JSON line on stdout.

Headline metric: flash-attention forward TFLOP/s per chip at the
reference's flagship config (B=1, H=32, N=8192, D=128, bf16, non-causal —
test_flash_attn.cu:854-869 / BASELINE.md). vs_baseline compares against
the reference's best published number on A100 (CUTLASS tensor-core
kernel: 3.02 TFLOP/s, pmph-a6.tex:289).

Methodology: device-pure loop timing. The kernel runs N times inside
ONE jitted `fori_loop` dispatch (a scalar carry derived from the output
feeds the next iteration's query so XLA cannot hoist/CSE the call), and
the per-iteration time is the slope between an N=25 and an N=1
dispatch — so host->device transport jitter, which on tunneled
transports can add tens of ms per dispatch with heavy variance, cancels
entirely instead of contaminating the measurement (the previous
host-fed chain method read 112-190 TFLOP/s across rounds on a congested
tunnel; this method repeats within ~1%). The carry add costs one
elementwise pass over Q per iteration (~2% of kernel time), biasing the
reported number slightly LOW — conservative.
"""

import json
import statistics
import sys
import time

import numpy as np

BASELINE_TFLOPS = 3.02  # reference CUTLASS-TC at (1,32,8192,128)


def main():
    import jax
    import jax.numpy as jnp

    from flash_attention_tpu.ops.flash import flash_attention

    B, H, N, D = 1, 32, 8192, 128
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)

    def make_loop(n):
        @jax.jit
        def run(q, k, v):
            def body(i, carry):
                o = flash_attention(q + carry, k, v)
                return (0.0 * o[0, 0, 0, 0]).astype(q.dtype)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), q.dtype))

        return run

    inner = 25

    def timed(fn, trials=3):
        out = fn(q, k, v)
        np.asarray(jax.device_get(out))          # compile + sync
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(q, k, v)))
            ts.append(time.perf_counter() - t0)
        return ts

    t_start = time.monotonic()
    loop_n, loop_1 = make_loop(inner), make_loop(1)
    # Up to 3 rounds (median reported, all recorded); a wall-clock guard
    # keeps a degraded transport from hanging the driver — one finished
    # round beats a hung capture.
    rounds = []
    spreads = []
    for i in range(3):
        tn = statistics.median(timed(loop_n))
        t1 = statistics.median(timed(loop_1))
        ms = max((tn - t1) / (inner - 1), 1e-9) * 1e3
        rounds.append(ms)
        spreads.append(round(4 * B * H * N * N * D / (ms / 1e3) / 1e12, 2))
        if time.monotonic() - t_start > 240:
            break
    ms = statistics.median(rounds)
    tflops = 4 * B * H * N * N * D / (ms / 1e3) / 1e12
    print(
        json.dumps(
            {
                "metric": "flash_attention_fwd_tflops_1x32x8192x128_bf16",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops / BASELINE_TFLOPS, 2),
                "latency_ms": round(ms, 3),
                "rounds_tflops": spreads,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
