"""Flash-decode: single-step attention against a (possibly quantized)
KV cache with ragged per-sequence lengths.

North-star serving kernel (no reference counterpart — the reference has
no decode/inference path at all, SURVEY.md §5). Design notes:

  * Decode is HBM-bandwidth-bound: the roofline is reading the live KV
    prefix once. The kernel streams KV blocks through VMEM (the Pallas
    pipeline double-buffers), with the GQA head group as the matmul's
    row dim — q is [B, Hkv, G, D] where G = Hq/Hkv, so each loaded KV
    tile serves all G query heads at once (KV read amplification 1/G vs
    per-head layouts).
  * Per-sequence `lengths` arrive via scalar prefetch: block index maps
    consult them to redirect the DMA of out-of-range KV blocks to block
    0 (no wasted bandwidth), and in-kernel masking handles the partial
    tail block. This is the continuous-batching contract: one batch, any
    mix of sequence lengths.
  * INT8/FP8 KV dequantizes inside the loop: tile.astype(f32) * the
    block's channel-scale row (ops/quant.py layout), then bf16 into the
    MXU — dequant never touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.config import (
    LANES,
    cdiv,
    interpret_default,
    round_up,
)
from flash_attention_tpu.ops.flash import INIT_M, LOG2E, MASK_VALUE
from flash_attention_tpu.ops.quant import (
    QUANT_BLOCK,
    QuantizedTensor,
    tile_to_f32,
)

# Measured on v5e (B=64, Hkv=8, S=4096, D=128, ragged lengths):
#   bk=512: 337 GB/s | 1024: 430 | 2048: 497 | 4096: 478 (dense bf16)
#   int8 keeps climbing to bk=4096 (454 GB/s of half-width bytes = ~720
#   GB/s wire rate, ~88% of HBM). Large blocks amortize grid overhead;
#   block-granular ragged skipping argues for smaller ones — 2048 is the
#   measured sweet spot for mixed lengths.
DEFAULT_BLOCK_KV = 2048


def _dequant(tile_ref, scale_ref, jk, out_dtype):
    """tile [bk, D] int8/fp8 + full scale table [S/QUANT_BLOCK, D] ->
    [bk, D]. The whole per-(b,h) scale table rides in VMEM (it is ~16 KB)
    because Mosaic block shapes must be sublane-divisible; the kernel
    slices the rows for kv block jk. fp8 widens via the exact bit-plant
    trick (ops/quant.py tile_to_f32), not Mosaic's slow fp8 emulation.
    """
    tile = tile_to_f32(tile_ref[0, 0])
    bk, d = tile.shape
    nb = bk // QUANT_BLOCK
    scales = scale_ref[0, 0, pl.ds(jk * nb, nb), :]   # [nb, D] f32
    scaled = tile.reshape(nb, QUANT_BLOCK, d) * scales[:, None, :]
    return scaled.reshape(bk, d).astype(out_dtype)


def _decode_kernel(lengths_ref, q_ref, *rest, scale, block_kv,
                   num_kv_blocks, quantized, compute_dtype, window=None):
    if quantized:
        k_ref, v_ref, kscale_ref, vscale_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = rest

    b, jk = pl.program_id(0), pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(jk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    in_range = jk * block_kv < length
    if window is not None:
        # Blocks entirely older than the window skip compute (and their
        # DMA, via the index-map clamp below).
        in_range = jnp.logical_and(
            in_range, (jk + 1) * block_kv > length - window)

    @pl.when(in_range)
    def _compute():
        q = q_ref[0, 0]                            # [G, D]
        if quantized:
            k = _dequant(k_ref, kscale_ref, jk, compute_dtype)
            v = _dequant(v_ref, vscale_ref, jk, compute_dtype)
        else:
            k = k_ref[0, 0]
            v = v_ref[0, 0]
        # Unscaled scores; scale folded into exp2 (flash.py LOG2E note).
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [G, bk]
        col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_kv
        s = jnp.where(col >= length, MASK_VALUE, s)
        if window is not None:
            s = jnp.where(col < length - window, MASK_VALUE, s)

        c = scale * LOG2E
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_new = jnp.maximum(
            m_prev,
            jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True), m_prev.shape),
        )
        alpha = jnp.exp2((m_prev - m_new) * c)
        p = jnp.exp2((s - m_new[:, :1]) * c)
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_new
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jk == num_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_kv", "interpret", "window"),
)
def flash_decode(q, k, v, lengths, *, scale=None, block_kv=DEFAULT_BLOCK_KV,
                 window=None, interpret=None):
    """Single-step decode attention.

    Args:
      q: [B, Hq, D] — one new query token per sequence.
      k, v: [B, Hkv, S, D] bf16/fp16/fp32 cache, or QuantizedTensor
        (int8/fp8 values + block-channel scales) for both.
      lengths: [B] int32 — live prefix length per sequence (<= S).
      window: sliding-window size — attend only the most recent
        `window` cached positions (Mistral/Gemma local attention);
        older blocks skip compute and DMA.

    Returns [B, Hq, D] in q's dtype.
    """
    quantized = isinstance(k, QuantizedTensor)
    if quantized != isinstance(v, QuantizedTensor):
        raise ValueError("k and v must both be quantized or both dense")
    kv_vals = k.values if quantized else k
    batch, hq, d = q.shape
    _, hkv, s, _ = kv_vals.shape
    if hq % hkv:
        raise ValueError(f"Hq={hq} must be a multiple of Hkv={hkv}")
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if interpret is None:
        interpret = interpret_default()
    if s <= block_kv:
        block_kv = s          # single block; any length is a legal block
    elif s % block_kv:
        # Auto-shrink to the largest lane-aligned divisor of s so any
        # cache length works (callers need not know the block size).
        # Iterate descending MULTIPLES of 128 (128 always divides a
        # 128-multiple cache), so the error path only fires for
        # genuinely misaligned lengths.
        block_kv = 0
        for cand in range(min(DEFAULT_BLOCK_KV, s // 2) // 128 * 128,
                          0, -128):
            if s % cand == 0:
                block_kv = cand
                break
        if not block_kv:
            raise ValueError(
                f"cache length {s} has no lane-aligned block divisor; "
                "round the cache up to a multiple of 128")
    num_kv_blocks = s // block_kv
    lengths = lengths.astype(jnp.int32)

    grid = (batch, hkv, num_kv_blocks)

    def q_index(b, hk, jk, lens):
        return (b, hk, 0, 0)

    def kv_index(b, hk, jk, lens):
        # Redirect out-of-range blocks to a block that runs so the
        # pipeline never DMAs dead cache lines.
        jmin = 0
        if window is not None:
            jmin = jnp.maximum(lens[b] - window, 0) // block_kv
            jk = jnp.maximum(jk, jmin)
        jk = lax.select(jk * block_kv < lens[b], jk, jmin)
        return (b, hk, jk, 0)

    def kv_scale_index(b, hk, jk, lens):
        return (b, hk, 0, 0)   # full per-(b,h) scale table resides in VMEM

    in_specs = [
        pl.BlockSpec((1, 1, group, d), q_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
    ]
    inputs = [
        q.reshape(batch, hkv, group, d),
        kv_vals,
        v.values if quantized else v,
    ]
    if quantized:
        n_scale_rows = s // QUANT_BLOCK
        in_specs += [
            pl.BlockSpec((1, 1, n_scale_rows, d), kv_scale_index),
            pl.BlockSpec((1, 1, n_scale_rows, d), kv_scale_index),
        ]
        inputs += [k.scales, v.scales]

    compute_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=scale, block_kv=block_kv,
            num_kv_blocks=num_kv_blocks, quantized=quantized,
            compute_dtype=compute_dtype, window=window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, group, d), q_index),
            scratch_shapes=[
                pltpu.VMEM((group, LANES), jnp.float32),
                pltpu.VMEM((group, LANES), jnp.float32),
                pltpu.VMEM((group, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, *inputs)
    return out.reshape(batch, hq, d)


def decode_reference(q, k, v, lengths, *, scale=None, window=None):
    """Exact decode reference: mask positions >= length (and, with
    window, positions < length - window), fp32 softmax."""
    from flash_attention_tpu.ops.quant import dequantize_kv
    if isinstance(k, QuantizedTensor):
        k = dequantize_kv(k, dtype=jnp.float32)
        v = dequantize_kv(v, dtype=jnp.float32)
    batch, hq, d = q.shape
    _, hkv, s, _ = k.shape
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    kk = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    sc = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kk,
                    precision=lax.Precision.HIGHEST) * scale
    pos = jnp.arange(s)[None, None, :]
    sc = jnp.where(pos >= lengths[:, None, None], -jnp.inf, sc)
    if window is not None:
        sc = jnp.where(pos < (lengths - window)[:, None, None],
                       -jnp.inf, sc)
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bhs,bhsd->bhd", p, vv,
                   precision=lax.Precision.HIGHEST)
    return o.astype(q.dtype)
