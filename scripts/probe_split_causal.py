"""Measure the two-pass causal split vs single-pass (VERDICT r4 task 8).

Flagship config (1, 32, 8192, 128) bf16 + the 2K tile-floor config.
Useful-FLOPs convention: 2*B*H*N^2*D (causal halves the work).

Run on the real chip:  PYTHONPATH=. python scripts/probe_split_causal.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.flash import (
    flash_attention_fwd, flash_attention_fwd_split,
)
from flash_attention_tpu.utils.bench import measure

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}")

for (B, H, N, D) in ((1, 32, 8192, 128), (8, 32, 2048, 128),
                     (1, 32, 2048, 128)):
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.bfloat16)
    flops = 2 * B * H * N * N * D   # causal useful work

    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, save_residuals=False)[0])
    t = measure(fn, q, k, v, warmup=3, iters=5)
    print(f"({B},{H},{N},{D}) single-pass causal: "
          f"{t.mean_ms:8.3f} ms  {flops / t.mean_s / 1e12:6.1f} TF/s")

    for band, dq, dkv in ((2048, 256, 256), (2048, 256, 512),
                          (2048, 512, 512), (1024, 256, 256)):
        if N % band:
            continue
        fn2 = jax.jit(lambda q, k, v, _b=band, _dq=dq, _dkv=dkv:
                      flash_attention_fwd_split(
                          q, k, v, band=_b,
                          diag_block_sizes=BlockSizes(
                              block_q=_dq, block_kv=_dkv))[0])
        # correctness spot check once per config
        err = float(jnp.max(jnp.abs(
            fn2(q, k, v).astype(jnp.float32)
            - fn(q, k, v).astype(jnp.float32))))
        t = measure(fn2, q, k, v, warmup=3, iters=5)
        print(f"  split band={band} diag={dq}x{dkv}: "
              f"{t.mean_ms:8.3f} ms  {flops / t.mean_s / 1e12:6.1f} "
              f"TF/s  (maxabs {err:.1e})")
