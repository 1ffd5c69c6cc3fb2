"""Quantized KV-cache: INT8 / FP8 storage with block-wise channel scales.

North-star capability with no reference counterpart (SURVEY.md §7.1,
BASELINE.json north_star): weight-only KV quantization whose dequant is
fused into the attention kernels' inner loops (see ops/decode.py and the
quantized prefill path).

Scheme: scales per (head, token-block, channel) with QUANT_BLOCK=128
tokens per block.
  - Channel-wise (over D) handles K's RoPE-induced per-channel spread
    far better than per-token scales, and a [1, D] scale row broadcasts
    across the token (sublane) dim for free on the VPU — no transposes.
  - Token-block-wise keeps appends local: writing token t only touches
    the scale row of block t // 128, so a running cache never rescales
    history.
  - Inside a kernel, a KV tile [bk, D] int8 dequantizes as
    `tile.astype(bf16) * repeat(scales, 128, axis=0)` — one VPU multiply
    feeding the MXU dot.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

QUANT_BLOCK = 128  # tokens per scale block (= one lane-width of rows)

# Max representable magnitude per storage dtype.
_QMAX = {
    jnp.dtype(jnp.int8): 127.0,
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """values: [B, H, S, D] in int8/fp8; scales: [B, H, S/QUANT_BLOCK, D]
    fp32 such that dequant(values)[b,h,s,d] = values * scales[b,h,s//128,d].
    """

    values: jax.Array
    scales: jax.Array

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def tree_flatten(self):
        return (self.values, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.partial(jax.jit, static_argnames=("dtype",))
def quantize_kv(x, *, dtype=jnp.int8) -> QuantizedTensor:
    """Quantize a [B, H, S, D] tensor to int8/fp8 with block-channel
    scales. S must be a multiple of QUANT_BLOCK (pad the cache, not the
    data — caches are block-allocated anyway)."""
    b, h, s, d = x.shape
    if s % QUANT_BLOCK:
        raise ValueError(f"seq {s} must be a multiple of {QUANT_BLOCK}")
    qmax = _QMAX[jnp.dtype(dtype)]
    xf = x.astype(jnp.float32).reshape(b, h, s // QUANT_BLOCK, QUANT_BLOCK, d)
    absmax = jnp.max(jnp.abs(xf), axis=3, keepdims=True)     # [..., 1, d]
    scale = jnp.maximum(absmax / qmax, 1e-8)
    q = xf / scale
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        q = jnp.clip(jnp.round(q), -qmax, qmax)
    vals = q.astype(dtype).reshape(b, h, s, d)
    return QuantizedTensor(values=vals, scales=scale[..., 0, :])


@functools.partial(jax.jit, static_argnames=("dtype",))
def dequantize_kv(qt: QuantizedTensor, dtype=jnp.bfloat16):
    """Reference dequantization (the kernels fuse this; this is the
    verification path)."""
    b, h, s, d = qt.values.shape
    v = qt.values.astype(jnp.float32).reshape(
        b, h, s // QUANT_BLOCK, QUANT_BLOCK, d
    )
    out = v * qt.scales[:, :, :, None, :]
    return out.reshape(b, h, s, d).astype(dtype)


def quantization_error(x, *, dtype=jnp.int8):
    """Round-trip max-abs error — harness metric for the perplexity-delta
    gate (north_star: ppl delta <= 0.05 needs per-block channel scales)."""
    qt = quantize_kv(x, dtype=dtype)
    back = dequantize_kv(qt, dtype=jnp.float32)
    return float(jnp.max(jnp.abs(back - x.astype(jnp.float32))))
