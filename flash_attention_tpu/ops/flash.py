"""Flagship flash-attention: Pallas TPU forward + recompute backward.

TPU-first re-design of the reference's FA kernels (SURVEY.md C1, C9, C10,
C12, C13, C18-C20). Nothing here is a translation — the parallel
structure is rebuilt around the TPU execution model:

  * The grid is (batch, q_head, q_block, kv_block) with the kv dimension
    innermost and sequential ("arbitrary"): on TPU, grid steps run
    sequentially on a core, so the online-softmax state (m, l, acc) lives
    in VMEM scratch across kv steps instead of the reference's
    shared-memory arena + __syncthreads() discipline
    (flash_attn_unified.cu:83-109,201-274).
  * QK^T and PV tiles hit the MXU via `jax.lax.dot_general` with fp32
    accumulation — the role the WMMA fragments play in
    flash_attn_cutlass.cu:136-260, without the 16x16 edge-case fallback
    (Mosaic handles non-multiple tiles).
  * Row max / row sum run vectorized on the 8x128 VPU across lanes — the
    rethought version of the serial tid-0 softmax
    (flash_attn_unified.cu:229-258) and the warp-shuffle butterfly
    reduction (flash_attn_cutlass.cu:267-342); stats are kept
    lane-replicated [block_q, 128] so no cross-lane transposes occur.
  * The online softmax is the LAZY (stale-max) formulation: p is
    exponentiated against the previous block's running max, so the
    exp2/astype stream has no dependency on this block's row max and
    Mosaic overlaps it with both MXU dots; the max correction folds
    into one per-row rescale of acc/l. Measured 184 vs 142 TFLOP/s
    (non-causal flagship) against the textbook dot->max->exp2->dot
    chain. Exactness: p_hat = p / beta identically; see the note in
    _fwd_kernel for the fp32-range contract.
  * The backward pass keeps the recompute strategy of the Triton FA2
    kernel (FA2-triton.py:98-170) but is restructured without atomics
    (TPUs have none): a dQ kernel gridded over Q blocks and a dK/dV
    kernel gridded over KV blocks, each recomputing P from the saved
    log-sum-exp (FA2-paper dual-loop structure, SURVEY.md §7.3).
  * Numerics contract (SURVEY.md §2.3): bf16/fp16 storage for Q/K/V/O,
    fp32 for S, P, stats and accumulators, softmax scale 1/sqrt(d)
    applied to S before the max-reduction.
  * Causal masking with a q/kv length offset (decode-friendly), GQA/MQA
    head mapping, and sequence padding — all absent or partial in the
    reference (causal existed only in the Triton path, FA2-triton.py:70-73).

Skipped causal blocks use the index-map prefetch trick: a block that will
not run maps its DMA to the block needed next, so no bandwidth is wasted.

Ecosystem conventions (the MASK_VALUE constant, SegmentIds container,
BlockSpec idioms) follow the public JAX Pallas TPU flash-attention op
(jax/experimental/pallas/ops/tpu/flash_attention.py); the kernel bodies
here — lazy stale-max softmax, exp2 scale folding, windowed/quantized/
segment paths, both backward kernels — are original to this framework.
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
    BlockSizes,
    cdiv,
    default_block_sizes,
    interpret_default,
    round_up,
)

# Large-negative mask value; -inf would poison exp() for fully-masked rows.
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

# Running-max initializer. MUST be far above MASK_VALUE: a fully-masked
# row has every score == MASK_VALUE, and if m could also reach
# MASK_VALUE then p = exp2((s - m)*c) = 1 per masked position — the row
# silently outputs mean(v) and leaks gradients across the mask (hit by
# segment ids whose q document has no kv match). With INIT_M > MASK
# the row max stays INIT_M, p = exp2(very negative) = 0, l stays 0, and
# the l==0 store guard zeroes the output.
INIT_M = -1e37

# exp(x*scale) == exp2(x * (scale*LOG2E)): tracking the row max on the
# UNSCALED scores and folding the softmax scale into the exp2 constant
# removes one full [block_q, block_kv] VPU multiply per tile (exp lowers
# to exp2 anyway) — measured +7% on the flagship config. Requires
# scale > 0 (max must commute with the scaling); kernels assert that.
LOG2E = float(np.log2(np.e))


def _mxu_precision(dtype):
    """fp32 inputs must not silently degrade to one-pass bf16 on the MXU
    (the XLA default): the fp32 path is the exactness contract the
    reference's FP32 baseline provides. bf16/fp16 use the native pass."""
    return (
        lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else lax.Precision.DEFAULT
    )


def _dimension_semantics(*sems):
    from flash_attention_tpu.config import VMEM_LIMIT_BYTES
    return pltpu.CompilerParams(
        dimension_semantics=sems, vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _below_or_on_diag(i, block_q, j, block_kv, offset):
    """True iff q block i contains at least one unmasked (row, col) pair
    against kv block j under `col <= row + offset`."""
    return (i + 1) * block_q - 1 + offset >= j * block_kv


def _within_window(i, block_q, j, block_kv, offset, window):
    """True iff q block i has at least one visible pair against kv block
    j under the sliding window `col > row + offset - window` (blocks
    entirely older than the window skip, causal skip handles newer)."""
    return (j + 1) * block_kv - 1 > i * block_q + offset - window


def _block_runs(i, j, *, block_q, block_kv, causal, offset, window,
                strict_below=None):
    if strict_below is not None:
        # Two-pass causal split, bulk pass: only blocks ENTIRELY below
        # q block i's W-wide diagonal BAND run (every element visible —
        # no mask at all); the band itself is the separate fine-tiled
        # diag_band pass (flash_attention_fwd_split).
        w = strict_below
        return (j + 1) * block_kv <= (i * block_q // w) * w
    run = (
        _below_or_on_diag(i, block_q, j, block_kv, offset)
        if causal else True
    )
    if window is not None:
        run = jnp.logical_and(
            run, _within_window(i, block_q, j, block_kv, offset, window))
    return run


@jax.tree_util.register_pytree_node_class
class SegmentIds:
    """Packed-sequence segment ids: q [B, Nq] int32, kv [B, Nk] int32.
    Attention is masked wherever q and kv segment ids differ — multiple
    documents pack into one sequence without cross-attention (standard
    production-training input pipeline; no reference counterpart)."""

    def __init__(self, q, kv):
        self.q = q
        self.kv = kv

    def tree_flatten(self):
        return (self.q, self.kv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _first_window_block(i, block_q, offset, window, block_kv):
    """Oldest kv block with any visible column for q block i."""
    oldest_col = i * block_q + offset - window + 1
    return jnp.maximum(oldest_col, 0) // block_kv


def _kv_block_redirect(i, j, *, block_q, block_kv, causal, offset, window,
                       strict_below=None):
    """Skipped-block DMA redirect shared by the forward and dQ grids:
    a block that will not run maps its DMA to one that will (any
    in-range index is correct; the kernel's should_run gate decides
    what computes)."""
    if strict_below is not None:
        w = strict_below
        return lax.select(
            (j + 1) * block_kv <= (i * block_q // w) * w, j,
            jnp.zeros_like(j))
    jmin = (_first_window_block(i, block_q, offset, window, block_kv)
            if window is not None else 0)
    if causal:
        j = lax.select(
            _below_or_on_diag(i, block_q, j, block_kv, offset), j, jmin
        )
    if window is not None:
        j = jnp.maximum(j, jmin)
    return j


def _mask_block_if_needed(s, i, j, *, num_q_blocks, num_kv_blocks,
                          qseg=None, kvseg=None, **mask_kw):
    """_mask_block, unconditionally.

    A block-level `lax.cond` skip ("only mask blocks that straddle the
    diagonal") was tried and REVERTED: Mosaic cannot software-pipeline
    across the conditional, and causal throughput HALVED (115 -> 67
    TFLOP/s at the flagship config) even though most blocks took the
    cheap branch. Cheap masking comes from the precomputed additive
    mask-tile path instead (one VPU add; see _fwd_kernel)."""
    return _mask_block(s, i, j, qseg=qseg, kvseg=kvseg, **mask_kw)


def _mask_block(s, i, j, *, block_q, block_kv, causal, offset,
                q_len, kv_len, q_padded, kv_padded, window=None,
                qseg=None, kvseg=None, block_h=1):
    """Apply causal/sliding-window, segment, and padding masks to a
    score tile s[block_h * block_q, block_kv] at grid position (q block
    i, kv block j). With block_h > 1 the tile stacks block_h q-heads'
    rows; row r's sequence position is (r % block_q) + i * block_q.
    Static config decides which masks are materialized; dynamic i/j
    drive the iota comparison. qseg: [block_h * block_q, 1] int32;
    kvseg: [1, block_kv] int32 slice of a [B, 1, Nk] carrier (layouts
    chosen so the comparison broadcasts with no cross-lane
    transpose)."""
    need_row = q_padded
    need_col = kv_padded
    if not (causal or need_row or need_col or window is not None
            or qseg is not None):
        return s
    row = lax.broadcasted_iota(jnp.int32, s.shape, 0)
    if block_h > 1:
        row = row % block_q
    row = row + i * block_q
    col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    bad = jnp.zeros(s.shape, jnp.bool_)
    if causal:
        bad = jnp.logical_or(bad, col > row + offset)
    if window is not None:
        # Sliding window: only the most recent `window` positions
        # (inclusive of the diagonal) are visible.
        bad = jnp.logical_or(bad, col <= row + offset - window)
    if qseg is not None:
        bad = jnp.logical_or(bad, qseg != kvseg)
    if need_col:
        bad = jnp.logical_or(bad, col >= kv_len)
    if need_row:
        bad = jnp.logical_or(bad, row >= q_len)
    return jnp.where(bad, MASK_VALUE, s)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dequant_tile(val_ref, scale_ref, out_dtype):
    """[bk, D] int8/fp8 tile + [bk/QUANT_BLOCK, D] scale rows -> [bk, D]
    in out_dtype: one VPU multiply feeding the MXU (ops/quant.py layout).
    fp8 widens via the exact bit-plant trick (ops/quant.py tile_to_f32),
    not Mosaic's slow fp8 emulation."""
    from flash_attention_tpu.ops.quant import tile_to_f32

    tile = tile_to_f32(val_ref[0, 0])
    scales = scale_ref[0, 0]
    bk, d = tile.shape
    nb = scales.shape[0]
    out = tile.reshape(nb, bk // nb, d) * scales[:, None, :]
    return out.reshape(bk, d).astype(out_dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, causal, offset, block_q,
                block_kv, num_kv_blocks, q_len, kv_len, q_padded, kv_padded,
                precision, window=None, segmented=False, quantized=False,
                compute_dtype=None, block_h=1, additive_mask=False,
                strict_below=False, diag_band=None):
    rest = list(rest)
    if additive_mask:
        mask_ref = rest.pop(0)
    if quantized:
        kscale_ref, vscale_ref = rest.pop(0), rest.pop(0)
    if segmented:
        qseg_ref, kvseg_ref = rest.pop(0), rest.pop(0)
    o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    i, j = pl.program_id(2), pl.program_id(3)
    if diag_band is not None:
        # Diagonal pass of the two-pass causal split: the grid's j dim
        # spans only the W-wide diagonal band; map it to the GLOBAL kv
        # block index (init/store still key on the grid-local j).
        jg = (i // (diag_band // block_q)) * (diag_band // block_kv) + j
    else:
        jg = j

    @pl.when(j == 0)
    def _init():
        # Stale-max pivot starts at 0, NOT -inf/INIT_M: the lazy-softmax
        # recurrence below is exact for ANY finite pivot, and 0 keeps
        # the first block's exp2 in fp32 range for every sane score
        # (overflow contract in the note below).
        m_scr[...] = jnp.zeros_like(m_scr)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = _block_runs(
        i, jg, block_q=block_q, block_kv=block_kv, causal=causal,
        offset=offset, window=window, strict_below=strict_below)

    @pl.when(should_run)
    def _compute():
        # block_h > 1 stacks block_h q-heads (one shared KV head under
        # GQA) as extra rows: the per-step GEMM stays fat while the
        # causal skip works at block_q granularity — the short-seq
        # causal lever (see BlockSizes.block_h).
        q = q_ref[0].reshape(block_h * block_q, -1)
        if quantized:
            k = _dequant_tile(k_ref, kscale_ref, compute_dtype)
            v = _dequant_tile(v_ref, vscale_ref, compute_dtype)
        else:
            k = k_ref[0, 0]
            v = v_ref[0, 0]
        # Scores stay UNSCALED; the scale folds into the exp2 constant
        # (see LOG2E note). m/l track unscaled-max statistics.
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        if additive_mask:
            # Precomputed additive causal tile: all diagonal blocks
            # share one pattern (bq == bkv, offset 0), below-diagonal
            # blocks need none, above-diagonal never run — so masking
            # is a single fused multiply-add against a VMEM-resident
            # constant instead of ~4 iota/compare/select passes per
            # block (measured +6% causal flagship).
            flag = jnp.where(i == jg, 1.0, 0.0)
            s = s + mask_ref[...] * flag
        else:
            qseg = None
            if segmented:
                qseg = qseg_ref[0][:, :1]
                if block_h > 1:
                    qseg = jnp.tile(qseg, (block_h, 1))
            s = _mask_block_if_needed(
                s, i, jg, num_q_blocks=pl.num_programs(2),
                num_kv_blocks=num_kv_blocks,
                block_q=block_q, block_kv=block_kv, causal=causal,
                offset=offset, q_len=q_len, kv_len=kv_len,
                q_padded=q_padded, kv_padded=kv_padded, window=window,
                qseg=qseg,
                kvseg=kvseg_ref[0] if segmented else None,
                block_h=block_h,
            )

        # LAZY (stale-max) online softmax: exponentiate against the
        # PREVIOUS running max, so p depends only on s elementwise and
        # Mosaic overlaps the exp2/astype stream with both MXU dots.
        # The textbook recurrence (p = exp2(s - m_new)) serializes
        # dot -> row-max -> exp2 -> dot per block and measured 142
        # TFLOP/s vs 186 for the dots alone at (2048, 2048); the stale
        # pivot takes the row max OFF the critical path and folds the
        # correction into one per-row rescale:
        #     p^ = exp2((s - m_prev) * c)         (= p / beta, exactly)
        #     beta = exp2((m_prev - m_new) * c)
        #     acc' = beta * (acc + p^ @ v);  l' = beta * (l + sum p^)
        # Overflow contract: fp32 exp2 overflows iff any score exceeds
        # the running pivot by > 128/c (~1000 score units at D=128's
        # 1/sqrt(D) scale) — far beyond any sane attention logit range;
        # masked entries hit exp2(-huge) = 0 exactly.
        c = scale * LOG2E
        m_prev = m_scr[...]                       # [bq, LANES], replicated
        l_prev = l_scr[...]
        p = jnp.exp2(s * c - m_prev[:, :1] * c)    # [bq, bk] fp32
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1], off-path
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        beta = jnp.exp2((m_prev - m_new) * c)      # rescale factor
        l_scr[...] = beta * (l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        ))
        m_scr[...] = m_new
        # FA1-style deferred normalization: accumulate unnormalized, divide
        # once at the end (flashAttention.cu:115-151 recurrence, vectorized).
        acc_scr[...] = beta[:, :1] * (acc_scr[...] + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ))

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)       # fully-masked rows -> 0
        o_ref[0] = (acc_scr[...] / l_safe[:, :1]).astype(
            o_ref.dtype).reshape(o_ref.shape[1:])
        if lse_ref is not None:
            # True (scaled) log-sum-exp: m is unscaled, so rescale here.
            # Fully-masked rows (l == 0) export lse = INIT_M * scale:
            # negative enough that every LSE-merge (ring, chunked
            # prefill, decode tail) weights them exactly 0, yet ABOVE
            # MASK_VALUE * scale so the recompute backward's
            # p = exp2(s*c - lse*LOG2E) still underflows to 0 on masked
            # entries instead of overflowing to inf (s == MASK_VALUE
            # there; lse = MASK_VALUE itself would flip the sign).
            lse_ref[0] = jnp.where(
                l == 0.0, INIT_M * scale,
                m_scr[...] * scale + jnp.log(l_safe)
            ).reshape(lse_ref.shape[1:])


def _fwd_cost(batch, hq, nq, nk, d, causal, itemsize, window=None):
    frac = 0.5 if causal else 1.0
    if window is not None and nk:
        frac = min(frac, window / nk)
    flops = int(4 * batch * hq * nq * nk * d * frac)
    bytes_accessed = itemsize * batch * hq * (3 * nq * d + 2 * nk * d)
    return pl.CostEstimate(
        flops=flops,
        bytes_accessed=bytes_accessed,
        transcendentals=int(batch * hq * nq * nk * frac),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_sizes", "interpret", "debug", "offset",
        "save_residuals", "window", "strict_below", "diag_band",
    ),
)
def flash_attention_fwd(
    q, k, v, segment_ids=None, *, causal=False, scale=None,
    block_sizes=None, offset=None, window=None, interpret=None,
    debug=False, save_residuals=True, strict_below=None,
    diag_band=None,
):
    """Forward flash attention. Returns (o, lse) where lse is the fp32
    log-sum-exp per row, lane-replicated as [B, Hq, Nq, 128] (TPU-friendly
    layout for the recompute backward; slice [..., 0] for a plain vector).

    q: [B, Hq, Nq, D] — k, v: [B, Hkv, Nk, D] with Hkv | Hq (GQA/MQA).
    k and v may be `QuantizedTensor`s (int8/fp8 values + block-channel
    scales, ops/quant.py): dequantization fuses into the kernel's inner
    loop — KV reads HBM at quantized width (the north-star long-context
    prefill path; forward-only).
    """
    from flash_attention_tpu.ops.quant import QuantizedTensor

    quantized = isinstance(k, QuantizedTensor)
    if quantized != isinstance(v, QuantizedTensor):
        raise ValueError("k and v must both be quantized or both dense")
    k_scales = v_scales = None
    if quantized:
        k, k_scales = k.values, k.scales
        v, v_scales = v.values, v.scales
    batch, hq, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    if hq % hkv:
        raise ValueError(f"Hq={hq} must be a multiple of Hkv={hkv}")
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if scale <= 0:
        raise ValueError("softmax scale must be positive (the kernels "
                         "track the row max on unscaled scores)")
    if offset is None:
        offset = nk - nq
    if causal and offset < 0:
        raise ValueError("causal attention requires Nq <= Nk (offset >= 0)")
    if window is not None:
        if not causal:
            raise ValueError("sliding window requires causal=True")
        if window < 1:
            raise ValueError("window must be >= 1")
    segmented = segment_ids is not None
    if segmented:
        qseg, kvseg = segment_ids.q, segment_ids.kv
        if qseg.shape != (batch, nq) or kvseg.shape != (batch, nk):
            raise ValueError(
                f"segment id shapes {qseg.shape}/{kvseg.shape} must be "
                f"({batch},{nq}) / ({batch},{nk})")
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = default_block_sizes(
            nq, nk, d, jnp.dtype(q.dtype).name, causal, group)
    block_q = min(block_sizes.block_q, round_up(nq, LANES))
    block_kv = min(block_sizes.block_kv, round_up(nk, LANES))
    # Head batching (see BlockSizes.block_h): only legal when whole
    # blocks of q heads share one KV head; silently fall back to 1
    # otherwise so callers need not special-case MHA or tiny models.
    block_h = getattr(block_sizes, "block_h", 1)
    if block_h > 1 and (group % block_h or hq % block_h):
        block_h = 1

    # Pad sequences to block multiples; masks inside the kernel keep padded
    # positions out of the softmax.
    nq_pad = round_up(nq, block_q)
    nk_pad = round_up(nk, block_kv)
    q_padded, kv_padded = nq_pad != nq, nk_pad != nk
    if q_padded:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
        if segmented:
            qseg = jnp.pad(qseg, ((0, 0), (0, nq_pad - nq)))
    if kv_padded:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        if segmented:
            kvseg = jnp.pad(kvseg, ((0, 0), (0, nk_pad - nk)))
        if quantized:
            from flash_attention_tpu.ops.quant import QUANT_BLOCK
            pad_rows = (nk_pad - nk) // QUANT_BLOCK
            k_scales = jnp.pad(
                k_scales, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
            v_scales = jnp.pad(
                v_scales, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))

    num_q_blocks = nq_pad // block_q
    num_kv_blocks = nk_pad // block_kv
    if diag_band is not None:
        # Diagonal pass of the two-pass split: the kv grid dim spans
        # only the W-wide band each q block lives in.
        if (not causal or window is not None or segmented or q_padded
                or kv_padded or offset != 0 or nq != nk):
            raise ValueError(
                "diag_band requires plain causal self-attention "
                "(no window/segments/padding, Nq == Nk)")
        if diag_band % block_q or diag_band % block_kv \
                or nq % diag_band:
            raise ValueError(
                f"diag_band={diag_band} must be a multiple of both "
                f"block sizes and divide Nq={nq}")
        num_kv_blocks = diag_band // block_kv
    grid = (batch, hq // block_h, num_q_blocks, num_kv_blocks)

    def q_index(b, h, i, j):
        return (b, h, i, 0)

    def _kv_block(i, j):
        if diag_band is not None:
            bb = diag_band // block_kv
            band0 = (i // (diag_band // block_q)) * bb
            jg = band0 + j
            return lax.select(
                _below_or_on_diag(i, block_q, jg, block_kv, 0),
                jg, band0)
        return _kv_block_redirect(
            i, j, block_q=block_q, block_kv=block_kv, causal=causal,
            offset=offset, window=window, strict_below=strict_below)

    def kv_index(b, h, i, j):
        return (b, (h * block_h) // group, _kv_block(i, j), 0)

    # Additive-causal fast path: every running block is either fully
    # visible or carries the one shared diagonal pattern. Exactly the
    # flagship self-attention case; padded/offset/window/segment shapes
    # keep the general iota mask.
    additive_mask = (causal and window is None and not segmented
                     and not q_padded and not kv_padded
                     and block_q == block_kv and offset == 0)
    if strict_below is not None:
        # Bulk pass of the two-pass causal split: only fully-visible
        # blocks run, so no masking of any kind. The diagonal band is
        # the caller's separate fine-tiled pass.
        if causal or window is not None or segmented or q_padded \
                or kv_padded or offset != 0:
            raise ValueError(
                "strict_below composes with none of causal/window/"
                "segments/padding/offset (it IS the mask)")
        if strict_below % block_q or strict_below % block_kv:
            raise ValueError(
                f"strict_below band {strict_below} must be a multiple "
                f"of block_q={block_q} and block_kv={block_kv}")
        additive_mask = False

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, offset=offset,
        block_q=block_q, block_kv=block_kv, num_kv_blocks=num_kv_blocks,
        q_len=nq, kv_len=nk, q_padded=q_padded, kv_padded=kv_padded,
        precision=_mxu_precision(q.dtype), window=window,
        segmented=segmented, quantized=quantized, compute_dtype=q.dtype,
        block_h=block_h, additive_mask=additive_mask,
        strict_below=strict_below, diag_band=diag_band,
    )

    in_specs = [
        pl.BlockSpec((1, block_h, block_q, d), q_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
        pl.BlockSpec((1, 1, block_kv, d), kv_index),
    ]
    inputs = [q, k, v]
    if additive_mask:
        rr = np.arange(block_h * block_q) % block_q
        cc = np.arange(block_kv)
        diag_tile = jnp.asarray(
            np.where(cc[None, :] > rr[:, None], MASK_VALUE, 0.0),
            jnp.float32)
        # Constant index map: the tile is DMA'd once and stays VMEM
        # -resident across the whole grid.
        in_specs.append(
            pl.BlockSpec((block_h * block_q, block_kv),
                         lambda b, h, i, j: (0, 0)))
        inputs.append(diag_tile)
    if quantized:
        from flash_attention_tpu.ops.quant import QUANT_BLOCK
        sb = block_kv // QUANT_BLOCK        # scale rows per kv block
        in_specs += [
            pl.BlockSpec((1, 1, sb, d), kv_index),
            pl.BlockSpec((1, 1, sb, d), kv_index),
        ]
        inputs += [k_scales, v_scales]
    if segmented:
        # q ids lane-replicated [B, Nq, LANES] -> per-block [bq, 1] with
        # no cross-lane transpose; kv ids [B, Nk] -> [1, bk] row vector.
        qseg_rep = lax.broadcast_in_dim(
            qseg.astype(jnp.int32), (batch, nq_pad, LANES), (0, 1))
        in_specs += [
            pl.BlockSpec((1, block_q, LANES), lambda b, h, i, j: (b, i, 0)),
            # kv ids ride as [B, 1, Nk]: Mosaic requires the block's
            # second-minor dim to be sublane-divisible OR equal to the
            # array dim — (1, block_kv) over [B, Nk] breaks for B > 1.
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, h, i, j: (b, 0, _kv_block(i, j))),
        ]
        inputs += [qseg_rep, kvseg.astype(jnp.int32)[:, None, :]]

    out_shape = [jax.ShapeDtypeStruct((batch, hq, nq_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_h, block_q, d), q_index)]
    if save_residuals:
        # The lane-replicated LSE costs ~2x the O write traffic (fp32 x
        # 128 lanes); inference paths skip it entirely.
        out_shape.append(
            jax.ShapeDtypeStruct((batch, hq, nq_pad, LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, block_h, block_q, LANES), q_index))
        wrapped = kernel
    else:
        n_extra = ((2 if quantized else 0) + (2 if segmented else 0)
                   + (1 if additive_mask else 0))

        def wrapped(*refs):
            head = refs[: 3 + n_extra + 1]        # ...through o_ref
            scratches = refs[3 + n_extra + 1:]
            kernel(*head, None, *scratches)       # lse_ref = None

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_h * block_q, LANES), jnp.float32),   # m
            pltpu.VMEM((block_h * block_q, LANES), jnp.float32),   # l
            pltpu.VMEM((block_h * block_q, d), jnp.float32),       # o acc
        ],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"
        ),
        cost_estimate=_fwd_cost(
            batch, hq, nq, diag_band if diag_band is not None else nk,
            d, causal, jnp.dtype(q.dtype).itemsize, window,
        ),
        interpret=interpret,
        debug=debug,
    )(*inputs)
    o, lse = (outs[0], outs[1]) if save_residuals else (outs[0], None)
    if q_padded:
        o = o[:, :, :nq]
        lse = lse[:, :, :nq] if lse is not None else None
    return o, lse


@functools.partial(
    jax.jit,
    static_argnames=("scale", "band", "block_sizes", "diag_block_sizes",
                     "interpret", "save_residuals"),
)
def flash_attention_fwd_split(
    q, k, v, *, scale=None, band=2048, block_sizes=None,
    diag_block_sizes=None, interpret=None, save_residuals=False,
):
    """Two-pass causal forward (VERDICT r4 task 8): a MASK-FREE bulk
    pass over blocks strictly below the W-wide diagonal band at the
    non-causal-optimal tile size, plus a fine-tiled diagonal pass whose
    kv grid spans only the band — then one LSE merge (the recurrence
    chunked prefill / ring already use). Rationale: single-pass causal
    wastes ~half of every diagonal block at 2048-wide tiles (the
    measured 2K tile floor, REPORT seq-sweep); the split buys back that
    block-granularity waste at the price of a second q/O stream + the
    merge. Returns (o, lse|None); numerics match flash_attention_fwd
    within lse-merge rounding.
    """
    batch, hq, nq, d = q.shape
    nk = k.shape[2]
    if nq != nk or nq % band:
        raise ValueError(
            f"split forward needs Nq == Nk divisible by band "
            f"(got {nq}/{nk}, band {band})")
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    o_b, lse_b = flash_attention_fwd(
        q, k, v, causal=False, strict_below=band, scale=scale,
        block_sizes=block_sizes, interpret=interpret,
        save_residuals=True)
    dbs = diag_block_sizes or BlockSizes(block_q=256, block_kv=256)
    o_d, lse_d = flash_attention_fwd(
        q, k, v, causal=True, diag_band=band, scale=scale,
        block_sizes=dbs, interpret=interpret, save_residuals=True)
    # LSE merge (bulk rows with no blocks export lse = INIT_M * scale,
    # weighting them exactly 0).
    lb = lse_b[..., :1]
    ld = lse_d[..., :1]
    m = jnp.maximum(lb, ld)
    wb = jnp.exp(lb - m)
    wd = jnp.exp(ld - m)
    den = wb + wd
    o = ((o_b.astype(jnp.float32) * wb + o_d.astype(jnp.float32) * wd)
         / den).astype(q.dtype)
    if save_residuals:
        lse = m + jnp.log(den)
        return o, jnp.broadcast_to(lse, lse_b.shape)
    return o, None


# ---------------------------------------------------------------------------
# Backward (recompute; dual-grid, no atomics)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale, causal, offset, block_q, block_kv,
                   num_kv_blocks, q_len, kv_len, q_padded, kv_padded,
                   precision, window=None, segmented=False):
    rest = list(rest)
    if segmented:
        qseg_ref, kvseg_ref = rest.pop(0), rest.pop(0)
    dq_ref, dq_scr = rest
    i, j = pl.program_id(2), pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = _block_runs(
        i, j, block_q=block_q, block_kv=block_kv, causal=causal,
        offset=offset, window=window)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]          # [bq, LANES] replicated
        delta = delta_ref[0, 0]
        # Unscaled scores; p = exp(s*scale - lse) = exp2(s*c - lse*LOG2E)
        # with the scale folded into c (see LOG2E note).
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        s = _mask_block_if_needed(
            s, i, j, num_q_blocks=pl.num_programs(2),
            num_kv_blocks=num_kv_blocks,
            block_q=block_q, block_kv=block_kv, causal=causal,
            offset=offset, q_len=q_len, kv_len=kv_len,
            q_padded=q_padded, kv_padded=kv_padded, window=window,
            qseg=qseg_ref[0][:, :1] if segmented else None,
            kvseg=kvseg_ref[0] if segmented else None,
        )
        p = jnp.exp2(s * (scale * LOG2E) - (lse[:, :1] * LOG2E))
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - delta[:, :1]) * scale
        dq_scr[...] += lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                    scale, causal, offset, block_q, block_kv,
                    num_q_blocks, num_inner, q_len, kv_len,
                    q_padded, kv_padded, precision, window=None,
                    segmented=False):
    rest = list(rest)
    if segmented:
        qseg_ref, kvseg_ref = rest.pop(0), rest.pop(0)
    dk_ref, dv_ref, dk_scr, dv_scr = rest
    jk, inner = pl.program_id(2), pl.program_id(3)
    iq = inner % num_q_blocks

    @pl.when(inner == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = _block_runs(
        iq, jk, block_q=block_q, block_kv=block_kv, causal=causal,
        offset=offset, window=window)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        s = _mask_block_if_needed(
            s, iq, jk, num_q_blocks=num_q_blocks,
            num_kv_blocks=pl.num_programs(2),
            block_q=block_q, block_kv=block_kv, causal=causal,
            offset=offset, q_len=q_len, kv_len=kv_len,
            q_padded=q_padded, kv_padded=kv_padded, window=window,
            qseg=qseg_ref[0][:, :1] if segmented else None,
            kvseg=kvseg_ref[0] if segmented else None,
        )
        # Scale folded into exp2 (see LOG2E note).
        p = jnp.exp2(s * (scale * LOG2E) - (lse[:, :1] * LOG2E))  # [bq, bk]
        # dV += P^T dO — contract over the q dim (dim 0 of both operands);
        # the MXU takes the transpose through dimension numbers, no data
        # movement (vs. tl.atomic_add cross-block accumulation,
        # FA2-triton.py:165-167).
        dv_scr[...] += lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - delta[:, :1]) * scale
        dk_scr[...] += lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(inner == num_inner - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_sizes", "interpret", "debug", "offset",
        "window",
    ),
)
def flash_attention_bwd(
    q, k, v, o, lse, do, segment_ids=None, *, causal=False, scale=None,
    block_sizes=None, offset=None, window=None, interpret=None,
    debug=False,
):
    """Recompute backward: returns (dq, dk, dv).

    lse is the lane-replicated [B, Hq, Nq, 128] stat from the forward.
    delta = rowsum(dO * O) replaces the dP rowsum (FA2-paper identity),
    computed here as a fused XLA reduction before the kernels.
    """
    batch, hq, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if offset is None:
        offset = nk - nq
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = default_block_sizes(
            nq, nk, d, jnp.dtype(q.dtype).name, causal)
    # dQ and dKV run as separate kernels with independently tunable
    # blocks (their working sets differ ~2x: dKV holds two accumulators
    # and both the s and ds tiles; see config._bwd_footprint_bytes).
    bq_dq = min(block_sizes.block_q_dq, round_up(nq, LANES))
    bkv_dq = min(block_sizes.block_kv_dq, round_up(nk, LANES))
    bq_dkv = min(block_sizes.block_q_dkv, round_up(nq, LANES))
    bkv_dkv = min(block_sizes.block_kv_dkv, round_up(nk, LANES))

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [B, Hq, Nq]
    delta = lax.broadcast_in_dim(
        delta, (batch, hq, nq, LANES), (0, 1, 2)
    )

    # One shared padded layout serves both grids.
    nq_pad = round_up(nq, int(np.lcm(bq_dq, bq_dkv)))
    nk_pad = round_up(nk, int(np.lcm(bkv_dq, bkv_dkv)))
    q_padded, kv_padded = nq_pad != nq, nk_pad != nk
    pad_q = ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0))
    segmented = segment_ids is not None
    if segmented:
        qseg, kvseg = segment_ids.q, segment_ids.kv
    if q_padded:
        q = jnp.pad(q, pad_q)
        do = jnp.pad(do, pad_q)
        # Padded rows must produce p == 0, not exp(big); pad lse with +big.
        lse = jnp.pad(lse, pad_q, constant_values=-MASK_VALUE)
        delta = jnp.pad(delta, pad_q)
        if segmented:
            qseg = jnp.pad(qseg, ((0, 0), (0, nq_pad - nq)))
    if kv_padded:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        if segmented:
            kvseg = jnp.pad(kvseg, ((0, 0), (0, nk_pad - nk)))
    if segmented:
        qseg_rep = lax.broadcast_in_dim(
            qseg.astype(jnp.int32), (batch, nq_pad, LANES), (0, 1))
        kvseg = kvseg.astype(jnp.int32)

    common = dict(
        scale=scale, causal=causal, offset=offset,
        q_len=nq, kv_len=nk, q_padded=q_padded, kv_padded=kv_padded,
        precision=_mxu_precision(q.dtype), window=window,
        segmented=segmented,
    )

    # --- dQ: grid over q blocks, sweep kv blocks sequentially.
    block_q, block_kv = bq_dq, bkv_dq
    num_q_blocks = nq_pad // block_q
    num_kv_blocks = nk_pad // block_kv

    def qrow_index(b, h, i, j):
        return (b, h, i, 0)

    def kv_index_dq(b, h, i, j):
        return (b, h // group, _kv_block_redirect(
            i, j, block_q=block_q, block_kv=block_kv, causal=causal,
            offset=offset, window=window), 0)

    dq_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), qrow_index),      # q
        pl.BlockSpec((1, 1, block_kv, d), kv_index_dq),    # k
        pl.BlockSpec((1, 1, block_kv, d), kv_index_dq),    # v
        pl.BlockSpec((1, 1, block_q, d), qrow_index),      # do
        pl.BlockSpec((1, 1, block_q, LANES), qrow_index),  # lse
        pl.BlockSpec((1, 1, block_q, LANES), qrow_index),  # delta
    ]
    dq_inputs = [q, k, v, do, lse, delta]
    if segmented:
        dq_in_specs += [
            pl.BlockSpec((1, block_q, LANES), lambda b, h, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, h, i, j: (
                             b, 0, kv_index_dq(b, h, i, j)[2])),
        ]
        dq_inputs += [qseg_rep, kvseg[:, None, :]]
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, num_kv_blocks=num_kv_blocks,
            block_q=block_q, block_kv=block_kv, **common
        ),
        grid=(batch, hq, num_q_blocks, num_kv_blocks),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), qrow_index),
        out_shape=jax.ShapeDtypeStruct((batch, hq, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"
        ),
        interpret=interpret,
        debug=debug,
    )(*dq_inputs)

    # --- dK/dV: grid over kv blocks; inner dim sweeps (q-head-in-group ×
    # q blocks) so GQA head-group gradients accumulate in VMEM scratch.
    block_q, block_kv = bq_dkv, bkv_dkv
    num_q_blocks = nq_pad // block_q
    num_kv_blocks = nk_pad // block_kv
    num_inner = group * num_q_blocks

    def first_valid_iq(jk):
        # Smallest q block index attending kv block jk under causal mask.
        return jnp.maximum(jk * block_kv - offset, 0) // block_q

    def last_window_iq(jk):
        # Newest q block with any row still inside the window for jk:
        # visibility needs row < col - offset + window.
        newest_row = (jk + 1) * block_kv - offset + window - 2
        return jnp.maximum(newest_row, 0) // block_q

    def q_index_dkv(b, hk, jk, inner):
        g = inner // num_q_blocks
        iq = inner % num_q_blocks
        if causal:
            iq = lax.select(
                _below_or_on_diag(iq, block_q, jk, block_kv, offset),
                iq, first_valid_iq(jk),
            )
        if window is not None:
            iq = jnp.minimum(iq, last_window_iq(jk))
        return (b, hk * group + g, iq, 0)

    def kv_index_dkv(b, hk, jk, inner):
        return (b, hk, jk, 0)

    dkv_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_index_dkv),      # q
        pl.BlockSpec((1, 1, block_kv, d), kv_index_dkv),    # k
        pl.BlockSpec((1, 1, block_kv, d), kv_index_dkv),    # v
        pl.BlockSpec((1, 1, block_q, d), q_index_dkv),      # do
        pl.BlockSpec((1, 1, block_q, LANES), q_index_dkv),  # lse
        pl.BlockSpec((1, 1, block_q, LANES), q_index_dkv),  # delta
    ]
    dkv_inputs = [q, k, v, do, lse, delta]
    if segmented:
        dkv_in_specs += [
            pl.BlockSpec(
                (1, block_q, LANES),
                lambda b, hk, jk, inner: (
                    b, q_index_dkv(b, hk, jk, inner)[2], 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, hk, jk, inner: (b, 0, jk)),
        ]
        dkv_inputs += [qseg_rep, kvseg[:, None, :]]
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, num_q_blocks=num_q_blocks, num_inner=num_inner,
            block_q=block_q, block_kv=block_kv, **common,
        ),
        grid=(batch, hkv, num_kv_blocks, num_inner),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), kv_index_dkv),
            pl.BlockSpec((1, 1, block_kv, d), kv_index_dkv),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hkv, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((batch, hkv, nk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"
        ),
        interpret=interpret,
        debug=debug,
    )(*dkv_inputs)

    if q_padded:
        dq = dq[:, :, :nq]
    if kv_padded:
        dk = dk[:, :, :nk]
        dv = dv[:, :, :nk]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp binding (role of _FlashAttnFn, FA2-triton.py:173-244)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _flash_attention(q, k, v, segment_ids, causal, scale, block_sizes,
                     offset, window, interpret):
    o, _ = flash_attention_fwd(
        q, k, v, segment_ids, causal=causal, scale=scale,
        block_sizes=block_sizes, offset=offset, window=window,
        interpret=interpret, save_residuals=False,
    )
    return o


def _flash_attention_vjp_fwd(q, k, v, segment_ids, causal, scale,
                             block_sizes, offset, window, interpret):
    o, lse = flash_attention_fwd(
        q, k, v, segment_ids, causal=causal, scale=scale,
        block_sizes=block_sizes, offset=offset, window=window,
        interpret=interpret,
    )
    return o, (q, k, v, segment_ids, o, lse)


def _flash_attention_vjp_bwd(causal, scale, block_sizes, offset, window,
                             interpret, residuals, do):
    q, k, v, segment_ids, o, lse = residuals
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, do, segment_ids, causal=causal, scale=scale,
        block_sizes=block_sizes, offset=offset, window=window,
        interpret=interpret,
    )
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_attention_vjp_fwd, _flash_attention_vjp_bwd)


def flash_attention(
    q, k, v, segment_ids: SegmentIds | None = None, *,
    causal: bool = False, scale: float | None = None,
    block_sizes: BlockSizes | None = None, offset: int | None = None,
    window: int | None = None, interpret: bool | None = None,
):
    """Differentiable flash attention (public API).

    The role of `flash_attention(q, k, v, causal=False)`
    (FA2-triton.py:240-244), with GQA and fp16/bf16/fp32 inputs. Unlike
    the reference, no dtype auto-cast happens here — pass bf16 for the
    MXU fast path; fp32 inputs run fp32 (slower, exact-ish).

    Args:
      q: [batch, q_heads, q_len, head_dim]
      k, v: [batch, kv_heads, kv_len, head_dim], kv_heads divides q_heads.
      causal: apply `col <= row + offset` masking (offset defaults to
        kv_len - q_len so the last q row sees the full kv prefix).
      scale: softmax scale, default 1/sqrt(head_dim).
      block_sizes: tile override; default from the VMEM-budget autotuner.
      window: sliding-window size (requires causal): position i attends
        positions (i+offset-window, i+offset] — the Mistral/Gemma local
        attention pattern; fully-out-of-window blocks skip compute AND
        their DMA (index-map redirect).
      interpret: force Pallas interpreter mode (defaults to True off-TPU).
    """
    return _flash_attention(
        q, k, v, segment_ids, causal, scale, block_sizes, offset, window,
        interpret
    )


def flash_attention_quantized(
    q, k, v, *, causal: bool = False, scale: float | None = None,
    block_sizes: BlockSizes | None = None, offset: int | None = None,
    interpret: bool | None = None,
):
    """Forward-only flash attention over an INT8/FP8-quantized KV cache
    (`QuantizedTensor` k/v): dequant fused into the QK^T/PV inner loops,
    KV HBM traffic at quantized width — the long-context prefill path of
    the north star (no reference counterpart). Inference-only: gradients
    through a quantized cache are not defined."""
    o, _ = flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, block_sizes=block_sizes,
        offset=offset, interpret=interpret, save_residuals=False,
    )
    return o
