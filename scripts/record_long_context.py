"""Record benchmarks/long_context_prefill: long-context causal GQA prefill.

Role of the reference's checked-in perf logs (SURVEY.md C26) for the
north-star long-context configs (BASELINE.json config 5's 128K prefill),
single chip: dense bf16 at 32K/128K plus the int8-KV fused-dequant row.
"""
import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash import flash_attention, flash_attention_quantized
from flash_attention_tpu.ops.quant import quantize_kv
from flash_attention_tpu.utils.bench import measure

HQ, HKV, D = 8, 2, 128
rng = np.random.default_rng(42)
mk = lambda s: jnp.asarray(rng.normal(0, 0.02, s), jnp.bfloat16)

fd = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
fq = jax.jit(
    lambda q, kv_, vv_, ks_, vs_: flash_attention_quantized(
        q, type(kq)(kv_, ks_), type(vq)(vv_, vs_), causal=True
    )
)

dev = jax.devices()[0]
print(f"Device: {dev.device_kind} ({dev.platform})")
print(f"long-context causal prefill, {HQ}q/{HKV}kv heads (GQA), D={D}, bf16")

for n in (32768, 131072):
    q, k, v = mk((1, HQ, n, D)), mk((1, HKV, n, D)), mk((1, HKV, n, D))
    fl = 4 * HQ * n * n * D * 0.5
    t = measure(fd, q, k, v, warmup=1, iters=3, inner=2)
    bytes_io = (q.nbytes + k.nbytes + v.nbytes + q.nbytes)
    print(
        f"flash causal N={n:<9} {t.mean_ms:10.3f} ms {fl / t.mean_s / 1e12:8.2f}"
        f" TFLOP/s {bytes_io / t.mean_s / 1e9:8.1f} GB/s"
    )
    if n == 131072:
        kq, vq = quantize_kv(k, dtype=jnp.int8), quantize_kv(v, dtype=jnp.int8)
        t2 = measure(
            fq, q, kq.values, vq.values, kq.scales, vq.scales,
            warmup=1, iters=3, inner=2,
        )
        print(
            f"int8-KV causal N={n:<7} {t2.mean_ms:10.3f} ms"
            f" {fl / t2.mean_s / 1e12:8.2f} TFLOP/s"
            f" {bytes_io / 2 / t2.mean_s / 1e9:8.1f} GB/s"
        )
