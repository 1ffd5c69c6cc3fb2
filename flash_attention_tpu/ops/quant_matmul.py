"""Weight-only INT8 matmul: y = x @ dequant(W), dequant fused in-kernel.

North-star support kernel (BASELINE.json config 4: "Llama-3-8B decode
... 1 host" — 8B bf16 weights alone exceed a v5e's 16 GB HBM; int8
weights halve both the footprint and, because decode is weight-read
bound, the per-token latency). Pallas kernel:

  * W is stored int8 [K, F] with one fp32 scale per OUTPUT channel
    [F] — since the scale is constant along the contraction, it is
    applied ONCE to the accumulator at the final store, not per tile:
    the inner loop is a plain int8-load -> bf16-convert -> MXU matmul.
  * HBM reads W at int8 width; the convert happens on the VPU in VMEM.
  * Grid (m, f, k) with k innermost sequential; fp32 accumulator
    scratch; bf16/f32 activations.

Large-m callers (prefill/training, compute-bound) should prefer
dequantize-then-einsum; this kernel targets skinny decode matmuls.
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
    SUBLANES,
    cdiv,
    interpret_default,
    round_up,
)
from flash_attention_tpu.ops.quant import _QMAX, tile_to_f32


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_scr, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    # int8 converts natively; fp8 widens via the exact bit-plant
    # (ops/quant.py tile_to_f32) — Mosaic's fp8 astype emulation is
    # ~8x slower.
    w = tile_to_f32(w_ref[...]).astype(x.dtype)
    acc_scr[...] += lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = (acc_scr[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def quant_matmul(x, w_q, w_scale, *, block_m=256, block_f=1024,
                 block_k=1024, interpret=None):
    # (1024, 1024) blocks measured 518 GB/s weight read on v5e at the 8B
    # MLP shape — best of the (f, k) grid sweep; W8A8 (int8 MXU) and a
    # transposed-[F,K] layout both measured SLOWER (int8 matmul is not
    # native on v5e; contiguity didn't pay).
    """y[m, f] = x[m, k] @ (w_q[k, f] * w_scale[f]).

    x: bf16/f32; w_q: int8 or fp8 (e4m3/e5m2, decoded via the exact
    bit-plant); w_scale: f32 per output channel.
    """
    m, k = x.shape
    k2, f = w_q.shape
    if k != k2 or w_scale.shape != (f,):
        raise ValueError(f"shape mismatch: x{x.shape} w{w_q.shape} "
                         f"scale{w_scale.shape}")
    if interpret is None:
        interpret = interpret_default()
    sub = SUBLANES.get(jnp.dtype(x.dtype).itemsize, 8)
    bm = min(block_m, round_up(m, sub))
    bf = min(block_f, round_up(f, LANES))
    bk = min(block_k, round_up(k, LANES))
    mp, fp, kp = round_up(m, bm), round_up(f, bf), round_up(k, bk)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
        w_q = jnp.pad(w_q, ((0, kp - k), (0, 0)))
    if fp != f:
        w_q = jnp.pad(w_q, ((0, 0), (0, fp - f)))
        w_scale = jnp.pad(w_scale, (0, fp - f))
    nk = kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(mp // bm, fp // bf, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bf), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, fp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_q, w_scale[None, :])
    return out[:m, :f]


def quantize_weight(w, *, axis_out=-1, dtype=jnp.int8):
    """Per-output-channel int8/fp8 quantization of a 2D weight [K, F]
    (axis_out selects the non-contracted axis). Returns (q, scale)."""
    if axis_out not in (-1, 1):
        raise ValueError("weights must be [contract, out]")
    dtype = jnp.dtype(dtype)
    qmax = _QMAX[dtype]
    wf = np.asarray(w, np.float32)
    absmax = np.abs(wf).max(axis=0)
    scale = np.maximum(absmax / qmax, 1e-12)
    q = wf / scale[None, :]
    if dtype == jnp.dtype(jnp.int8):
        q = np.clip(np.round(q), -qmax, qmax)
        return jnp.asarray(q, jnp.int8), jnp.asarray(scale, jnp.float32)
    # fp8: clip to the finite max (never emit NaN/inf codes — the
    # bit-plant decodes those patterns as large finite values).
    q = jnp.asarray(np.clip(q, -qmax, qmax)).astype(dtype)
    return q, jnp.asarray(scale, jnp.float32)


# Backward-compatible alias (the kernel now also takes fp8 weights).
int8_matmul = quant_matmul


def _dense_kernel(x_ref, w_ref, o_ref, acc_scr, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def dense_matmul(x, w, *, block_m=256, block_f=1024, block_k=1024,
                 interpret=None):
    """y[m, f] = x[m, k] @ w[k, f] as an explicit weight-streaming
    blocked Pallas matmul (fp32 accumulator scratch, k innermost
    sequential). Same structure that carries quant_matmul to ~518 GB/s
    at m=16 — the skinny-m dense path where XLA's own lowering can fall
    far under HBM speed (scripts/probe_prefill_cliff.py measures the
    gap; the small-dispatch prefill cliff, VERDICT r4 task 4)."""
    m, k = x.shape
    k2, f = w.shape
    if k != k2:
        raise ValueError(f"shape mismatch: x{x.shape} w{w.shape}")
    if interpret is None:
        interpret = interpret_default()
    sub = SUBLANES.get(jnp.dtype(x.dtype).itemsize, 8)
    bm = min(block_m, round_up(m, sub))
    bf = min(block_f, round_up(f, LANES))
    bk = min(block_k, round_up(k, LANES))
    mp, fp, kp = round_up(m, bm), round_up(f, bf), round_up(k, bk)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
        w = jnp.pad(w, ((0, kp - k), (0, 0)))
    if fp != f:
        w = jnp.pad(w, ((0, 0), (0, fp - f)))
    nk = kp // bk

    out = pl.pallas_call(
        functools.partial(_dense_kernel, nk=nk),
        grid=(mp // bm, fp // bf, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, fp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w)
    return out[:m, :f]


# ---------------------------------------------------------------------------
# INT4 (packed) weights
# ---------------------------------------------------------------------------

INT4_GROUP = 128   # original K rows per scale group


def _int4_kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_scr, *, nk,
                 rows_per_scale):
    """Packed-int4 matmul block. Byte j of w_ref packs ORIGINAL rows
    (2j, 2j+1) as (lo, hi) nibbles; the caller de-interleaves x into
    even/odd column planes, so the block computes
        acc += xe @ dequant(lo) + xo @ dequant(hi)
    with no in-kernel row interleave (two plain MXU dots). Scales vary
    along the contraction (group-wise), so they multiply W inside the
    loop — the same reshape-broadcast the KV dequant uses."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xe = xe_ref[...]
    xo = xo_ref[...]
    u = w_ref[...].astype(jnp.int32) & 0xFF
    lo = (((u & 0xF) ^ 8) - 8).astype(jnp.float32)
    hi = ((((u >> 4) & 0xF) ^ 8) - 8).astype(jnp.float32)
    bkp, bf = lo.shape
    ns = bkp // rows_per_scale
    sc = s_ref[...]                                   # [ns, bf]
    lo = (lo.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    hi = (hi.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    acc_scr[...] += lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[...] += lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def int4_matmul(x, w_packed, w_scales, *, block_m=256, block_f=1024,
                block_k=1024, interpret=None):
    """y[m, f] = x[m, k] @ dequant(w_packed, w_scales).

    x: bf16/f32 [M, K]; w_packed: int8 [K/2, F] (byte j = rows 2j/2j+1
    as lo/hi nibbles, values in [-7, 7]); w_scales: f32
    [K/INT4_GROUP, F] group-wise per-channel scales. block_k counts
    PACKED rows. K must be a multiple of INT4_GROUP.

    Measured (v5e, 8B MLP shape 4096x14336, m=16, device-pure loop):
    62 us vs int8's 95 us — 1.52x faster per matmul on half the bytes
    (501 GB/s effective on the packed read; the unpack costs some VPU
    density, bk=1024 is the sweep optimum)."""
    m, k = x.shape
    kp2, f = w_packed.shape
    if k != 2 * kp2 or k % INT4_GROUP:
        raise ValueError(f"shape mismatch: x{x.shape} packed"
                         f"{w_packed.shape} (K % {INT4_GROUP} != 0?)")
    if w_scales.shape != (k // INT4_GROUP, f):
        raise ValueError(f"scales {w_scales.shape} != "
                         f"({k // INT4_GROUP}, {f})")
    if interpret is None:
        interpret = interpret_default()
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    rows_per_scale = INT4_GROUP // 2                  # packed rows/group
    sub = SUBLANES.get(jnp.dtype(x.dtype).itemsize, 8)
    bm = min(block_m, round_up(m, sub))
    bf = min(block_f, round_up(f, LANES))
    bk = max(min(block_k, round_up(kp2, rows_per_scale)), rows_per_scale)
    mp = round_up(m, bm)
    fp = round_up(f, bf)
    kpp = round_up(kp2, bk)
    if mp != m:
        xe = jnp.pad(xe, ((0, mp - m), (0, 0)))
        xo = jnp.pad(xo, ((0, mp - m), (0, 0)))
    if kpp != kp2:
        xe = jnp.pad(xe, ((0, 0), (0, kpp - kp2)))
        xo = jnp.pad(xo, ((0, 0), (0, kpp - kp2)))
        w_packed = jnp.pad(w_packed, ((0, kpp - kp2), (0, 0)))
        w_scales = jnp.pad(
            w_scales,
            ((0, (kpp - kp2) // rows_per_scale), (0, 0)))
    if fp != f:
        w_packed = jnp.pad(w_packed, ((0, 0), (0, fp - f)))
        w_scales = jnp.pad(w_scales, ((0, 0), (0, fp - f)))
    nk = kpp // bk
    ns = bk // rows_per_scale

    out = pl.pallas_call(
        functools.partial(_int4_kernel, nk=nk,
                          rows_per_scale=rows_per_scale),
        grid=(mp // bm, fp // bf, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((ns, bf), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, fp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xe, xo, w_packed, w_scales)
    return out[:m, :f]


def quantize_weight_int4(w):
    """Group-wise (INT4_GROUP x channel) symmetric int4 RTN of a 2D
    weight [K, F]. Returns (packed int8 [K/2, F], scales f32
    [K/INT4_GROUP, F]); nibble range [-7, 7]."""
    wf = np.asarray(w, np.float32)
    k, f = wf.shape
    if k % INT4_GROUP:
        raise ValueError(f"K={k} must be a multiple of {INT4_GROUP}")
    g = wf.reshape(k // INT4_GROUP, INT4_GROUP, f)
    scale = np.maximum(np.abs(g).max(axis=1) / 7.0, 1e-12)  # [K/G, F]
    q = np.clip(np.round(g / scale[:, None, :]), -7, 7).astype(np.int32)
    q = q.reshape(k, f)
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    packed = ((hi << 4) | lo).astype(np.uint8).view(np.int8)
    return jnp.asarray(packed), jnp.asarray(scale, jnp.float32)
