"""Quantized KV-cache: INT8 / FP8 storage with block-wise channel scales.

North-star capability with no reference counterpart (SURVEY.md §7.1,
BASELINE.json north_star): weight-only KV quantization whose dequant is
fused into the attention kernels' inner loops (see ops/decode.py and the
quantized prefill path).

Choosing a KV storage dtype on v5e (measured, paged decode kernel at
batch 64 / Hq 32 / Hkv 8 / D 128 / ctx 4K):

  * bf16: the bandwidth baseline (~1.4 ms/step, ~740 GB/s KV read).
  * int8: fastest (~1.0-1.3 ms/step) AND half the cache bytes — the
    recommended v5e lowering when someone asks for "FP8 KV" and means
    throughput: v5e has no fp8 compute units, so fp8 cannot beat int8
    there.
  * fp8 (e4m3/e5m2): ~1.5x the int8 step time via the exact bit-plant
    dequant in `tile_to_f32` (Mosaic's astype emulation was ~8x bf16 —
    the bit-plant is what makes fp8 usable at all on v5e). Pick fp8
    over int8 when the cache must round-trip fp8 semantics (shared
    checkpoints/caches with fp8-native chips like v6e+, e4m3's wider
    dynamic range per block) and accept the VPU tax; pick int8 for
    v5e-resident serving.

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
from jax import lax

QUANT_BLOCK = 128  # tokens per scale block (= one lane-width of rows)

# Max representable magnitude per storage dtype.
_QMAX = {
    jnp.dtype(jnp.int8): 127.0,
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}

# fp8 -> fp32 bit-plant parameters: (mantissa_bits, exponent_bias).
# v5e has no fp8 compute units, and Mosaic's astype emulation of fp8
# loads measured ~8x slower than bf16 (round-1 decode table). Instead,
# `tile_to_f32` decodes on the VPU with integer ops: reinterpret the
# fp8 byte as int8, shift the exponent+mantissa field into the fp32
# layout (mantissa top-aligned: shift = 23 - man_bits), and ADD
# (127 - fp8_bias) << 23 in the INTEGER domain — an exact exponent
# rebias with no float multiply and, crucially, no fp32-subnormal
# intermediates (TPU and XLA:CPU flush fp32 denormals to zero, which
# breaks the multiply-by-2^k variant of this trick). fp8 subnormal
# codes (exponent field 0) don't follow the normal formula; they decode
# through an integer convert of the mantissa and a select. fp8 NaN/inf
# bit patterns decode as large finite values — quantize_kv never
# produces them (it clips to the finite max).
_FP8_BIT_PLANT = {
    jnp.dtype(jnp.float8_e4m3fn): (3, 7),
    jnp.dtype(jnp.float8_e5m2): (2, 15),
}


def tile_to_f32(tile):
    """Widen an int8/fp8 value tile to fp32 on the VPU (kernel helper).

    int8 uses the native convert; fp8 uses the exact bit-plant above
    (~8 integer VPU ops per element, vs Mosaic's slow fp8 emulation).
    Bit-exact with `astype(float32)` on every finite fp8 code,
    subnormals included.
    """
    dt = jnp.dtype(tile.dtype)
    if dt not in _FP8_BIT_PLANT:
        return tile.astype(jnp.float32)
    man_bits, bias = _FP8_BIT_PLANT[dt]
    shift = 23 - man_bits
    b = lax.bitcast_convert_type(tile, jnp.int8).astype(jnp.int32)
    mag = jnp.bitwise_and(b, 0x7F)
    normal_bits = lax.shift_left(mag, shift) + ((127 - bias) << 23)
    normal = lax.bitcast_convert_type(normal_bits, jnp.float32)
    # Subnormal codes: value = mantissa * 2^(1 - bias - man_bits).
    sub = mag.astype(jnp.float32) * float(2.0 ** (1 - bias - man_bits))
    val = jnp.where(mag < (1 << man_bits), sub, normal)
    return jnp.where(b >= 0, val, -val)  # int8 sign bit == fp8 sign bit


def tile_to_bf16(tile):
    """Widen an int8/fp8 value tile to bf16 via a 16-bit-domain bit-plant.

    Same decode as `tile_to_f32` but planted into the bf16 layout with
    int16 arithmetic — half the VPU register traffic per element when
    Mosaic keeps the lanes packed. EXACT: every finite fp8 value is
    representable in bf16 (e4m3/e5m2 mantissas fit bf16's 7 bits, the
    exponent ranges sit inside bf16's), so
    `tile_to_bf16(t) == tile_to_f32(t).astype(bf16)` bit-for-bit,
    subnormal codes included (their values m*2^(1-bias-man) are normal
    bf16 numbers).
    """
    dt = jnp.dtype(tile.dtype)
    if dt not in _FP8_BIT_PLANT:
        return tile.astype(jnp.bfloat16)
    man_bits, bias = _FP8_BIT_PLANT[dt]
    shift = 7 - man_bits
    b = lax.bitcast_convert_type(tile, jnp.int8).astype(jnp.int16)
    mag = jnp.bitwise_and(b, 0x7F)
    normal_bits = lax.shift_left(
        mag, jnp.int16(shift)) + jnp.int16((127 - bias) << 7)
    normal = lax.bitcast_convert_type(normal_bits, jnp.bfloat16)
    sub = mag.astype(jnp.bfloat16) * jnp.bfloat16(
        2.0 ** (1 - bias - man_bits))
    val = jnp.where(mag < (1 << man_bits), sub, normal)
    return jnp.where(b >= 0, val, -val)


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
