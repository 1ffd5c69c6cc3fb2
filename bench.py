#!/usr/bin/env python
"""Driver benchmark: one JSON line on stdout.

Headline metric: flash-attention forward TFLOP/s per chip at the
reference's flagship config (B=1, H=32, N=8192, D=128, bf16, non-causal —
test_flash_attn.cu:854-869 / BASELINE.md). vs_baseline compares against
the reference's best published number on A100 (CUTLASS tensor-core
kernel: 3.02 TFLOP/s, pmph-a6.tex:289).
"""

import json
import sys

import numpy as np

BASELINE_TFLOPS = 3.02  # reference CUTLASS-TC at (1,32,8192,128)


def main():
    import jax
    import jax.numpy as jnp

    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.utils.bench import bench_attention

    B, H, N, D = 1, 32, 8192, 128
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    # Median of 3 measurement rounds (all three recorded in the JSON so
    # readers can see the spread): the tunneled transport adds run-to-run
    # variance that a single round can eat (~5%), and best-of-N would
    # bias the recorded number upward.
    rounds = [
        bench_attention("flash_fwd", fn, q, k, v, causal=False,
                        warmup=3 if i == 0 else 1, iters=8, inner=5)
        for i in range(3)
    ]
    ordered = sorted(rounds, key=lambda r: r.tflops_per_s)
    report = ordered[len(ordered) // 2]
    print(
        json.dumps(
            {
                "metric": "flash_attention_fwd_tflops_1x32x8192x128_bf16",
                "value": round(report.tflops_per_s, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(report.tflops_per_s / BASELINE_TFLOPS, 2),
                "latency_ms": round(report.timing.mean_ms, 3),
                "rounds_tflops": [round(r.tflops_per_s, 2) for r in rounds],
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
