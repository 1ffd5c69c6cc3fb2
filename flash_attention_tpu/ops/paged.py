"""Paged attention: decode against page-table-indexed KV pools.

North-star serving kernel (SURVEY.md §7.1 item 5): the KV cache lives in
fixed-size pages of a global pool; sequences own arbitrary page lists
(managed by runtime/allocator.py — C++ free-list + refcounted prefix
sharing). The kernel walks a sequence's page table via scalar prefetch:
the page id IS the block index map, so "gather" costs nothing — each
grid step DMAs exactly one live page.

Pool layout: [Hkv, num_pages, page_size, D] — one page holds one head's
tokens, the same page id is reused across the head dimension, so a
single allocator page represents page_size tokens for ALL heads.

Quantized pools carry int8/fp8 values plus per-(page, channel-block)
scales [Hkv, num_pages, page_size/QUANT_BLOCK, D]; dequant happens
in-loop exactly as in ops/decode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.config import LANES, interpret_default
from flash_attention_tpu.ops.flash import INIT_M, LOG2E, MASK_VALUE
from flash_attention_tpu.ops.quant import QUANT_BLOCK, tile_to_f32

DEFAULT_PAGE_SIZE = 256


def _paged_kernel(lengths_ref, starts_ref, pt_ref, q_ref, *rest, scale,
                  page_size, max_pages, quantized, save_stats,
                  windowed=False, qpos_spread=1, fold_scales=False):
    idx = 0
    k_ref, v_ref = rest[0], rest[1]
    idx = 2
    if quantized:
        kscale_ref, vscale_ref = rest[idx], rest[idx + 1]
        idx += 2
    o_ref = rest[idx]
    idx += 1
    lse_ref = rest[idx] if save_stats else None
    idx += 1 if save_stats else 0
    m_scr, l_scr, acc_scr = rest[idx], rest[idx + 1], rest[idx + 2]

    b, p = pl.program_id(0), pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    in_range = p * page_size < length
    if windowed:
        # Pages entirely below the per-sequence window start skip
        # compute AND DMA (index-map clamp).
        in_range = jnp.logical_and(
            in_range, (p + 1) * page_size > starts_ref[b])

    @pl.when(in_range)
    def _compute():
        q = q_ref[0]                                 # [Hkv, G, D]
        v = None
        v_blocks = None
        if quantized and fold_scales:
            # int8 fast path (opt-in): skip the per-element dequant
            # multiply entirely. int8 codes are exact in bf16, and the
            # per-(token-block, channel) scales fold OUTSIDE the MXU:
            # on the K side into q per block (s_blk = (q*sc_blk)@k_int),
            # on the V side into each block's [Hkv, G, D] partial
            # accumulator — O(G*D) multiplies per block instead of
            # O(QUANT_BLOCK*D). VPU work per element drops from
            # convert+mul+pack to one convert.
            hkv, _, d = q.shape
            nb = page_size // QUANT_BLOCK
            k_i = k_ref[:, 0].astype(q.dtype)        # [Hkv, ps, D]
            v_i = v_ref[:, 0].astype(q.dtype)
            qf = q.astype(jnp.float32)
            parts = []
            for bi in range(nb):
                qs = (qf * kscale_ref[:, 0, bi][:, None, :]
                      ).astype(q.dtype)              # [Hkv, G, D]
                parts.append(lax.dot_general(
                    qs, k_i[:, bi * QUANT_BLOCK:(bi + 1) * QUANT_BLOCK],
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            s = jnp.concatenate(parts, axis=2)       # [Hkv, G, ps]
            v_blocks = (v_i, nb)
        elif quantized:
            hkv, _, d = q.shape
            nb = page_size // QUANT_BLOCK
            # fp8 widens via the exact bit-plant trick (ops/quant.py
            # tile_to_f32), not Mosaic's slow fp8 emulation.
            kt = tile_to_f32(k_ref[:, 0])            # [Hkv, ps, D]
            vt = tile_to_f32(v_ref[:, 0])
            k = (kt.reshape(hkv, nb, QUANT_BLOCK, d) *
                 kscale_ref[:, 0][:, :, None, :]).reshape(hkv, page_size, d)
            v = (vt.reshape(hkv, nb, QUANT_BLOCK, d) *
                 vscale_ref[:, 0][:, :, None, :]).reshape(hkv, page_size, d)
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)
        else:
            k = k_ref[:, 0]                          # [Hkv, ps, D]
            v = v_ref[:, 0]
        # All KV heads of this (seq, page) in ONE grid step: a batched
        # MXU matmul per page keeps blocks fat (8 heads x 1 MB of KV per
        # DMA) — a per-(head, page) grid was dispatch-overhead-bound.
        # Unscaled scores; scale folded into exp2 (flash.py LOG2E note).
        if v_blocks is None:
            s = lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [Hkv, G, ps]
        col = lax.broadcasted_iota(jnp.int32, s.shape, 2) + p * page_size
        s = jnp.where(col >= length, MASK_VALUE, s)
        if windowed:
            # Per-folded-query window start: with T positions folded
            # into the group dim (t fastest), query t's start is
            # starts_ref[b] + t. Starts may be negative (window not yet
            # full); col >= 0 makes the clamp implicit.
            start = starts_ref[b]
            if qpos_spread > 1:
                start = start + (
                    lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    % qpos_spread)
            s = jnp.where(col < start, MASK_VALUE, s)

        c = scale * LOG2E
        m_prev = m_scr[...]                          # [Hkv, G, LANES]
        l_prev = l_scr[...]
        m_new = jnp.maximum(
            m_prev,
            jnp.broadcast_to(jnp.max(s, axis=2, keepdims=True),
                             m_prev.shape),
        )
        alpha = jnp.exp2((m_prev - m_new) * c)
        pr = jnp.exp2((s - m_new[:, :, :1]) * c)
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(pr, axis=2, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_new
        if v_blocks is not None:
            v_i, nb_ = v_blocks
            pv = jnp.zeros_like(acc_scr[...])
            for bi in range(nb_):
                lo = bi * QUANT_BLOCK
                part = lax.dot_general(
                    pr[:, :, lo:lo + QUANT_BLOCK].astype(v_i.dtype),
                    v_i[:, lo:lo + QUANT_BLOCK],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                pv = pv + part * vscale_ref[:, 0, bi][:, None, :]
            acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + pv
        else:
            acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + lax.dot_general(
                pr.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [Hkv, G, D]

    @pl.when(p == max_pages - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe[:, :, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            # True (scaled) lse; fully-masked rows keep a huge negative
            # m so their merge weight is exactly 0.
            lse_ref[0] = m_scr[...] * scale + jnp.log(l_safe)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "return_lse",
                              "window", "qpos_spread", "fold_scales"),
)
def paged_flash_decode(q, k_pool, v_pool, page_table, lengths, *,
                       k_scales=None, v_scales=None, scale=None,
                       window=None, window_starts=None, qpos_spread=1,
                       interpret=None, return_lse=False,
                       fold_scales=False):
    """Decode attention over paged KV pools.

    Args:
      q: [B, Hq, D].
      k_pool, v_pool: [Hkv, num_pages, page_size, D] (bf16/fp16/fp32, or
        int8/fp8 when k_scales/v_scales are given).
      page_table: [B, max_pages] int32 — page ids per sequence; slots
        beyond the live prefix may hold anything in-range.
      lengths: [B] int32 — live token count per sequence.
      k_scales, v_scales: [Hkv, num_pages, page_size/QUANT_BLOCK, D] f32
        for quantized pools.
      window: sliding-window size relative to the NEXT position
        (`length`): only cached positions >= length - window are
        visible (Mistral/Gemma local attention). Pages entirely older
        skip compute and DMA, so long-context decode reads O(window)
        bytes instead of O(length).
      window_starts: [B] int32 — explicit per-sequence lowest visible
        position for the FIRST folded query, overriding `window` (the
        model decode path passes paged_len + tail_pos + 1 - window so
        tail tokens count against the window). May be negative (window
        not yet full — masking is implicit since columns are >= 0).
        Runtime data: one compiled program serves every position.
      qpos_spread: static — number of consecutive query POSITIONS
        folded into the head dim (t fastest; the speculative
        multi-token step). Folded query t's window start is
        window_starts + t, applied exactly in-kernel. DMA page
        skipping conservatively uses the t=0 (lowest) start.
      return_lse: also return the fp32 log-sum-exp [B, Hq] so callers
        can LSE-merge this partial with attention over other segments
        (the hot-tail decode path in models/llama.py).

      fold_scales: int8-only variant that skips the per-element dequant
        multiply (scales fold into q per token-block on the K side and
        into the per-block PV partials on the V side; int8 codes are
        exact in bf16). Measured +3% at (64, 32q/8kv, 4K, int8) — the
        multiply was already pipelined under the MXU dots; the
        int8->bf16 convert, not the scaling, is the int8 path's VPU
        cost. Kept as an opt-in measured experiment; numerics differ
        from the default path only by bf16 rounding association
        (max-abs ~1.5e-5 at 0.02-scale inputs).

    Returns [B, Hq, D], or (o, lse) with return_lse.
    """
    quantized = k_scales is not None
    if quantized != (v_scales is not None):
        raise ValueError("k_scales and v_scales must be given together")
    if fold_scales and (not quantized or
                        jnp.dtype(k_pool.dtype) != jnp.dtype(jnp.int8)):
        raise ValueError(
            "fold_scales is the int8 fast path: requires int8 pools "
            "with k_scales/v_scales (fp8 needs the bit-plant widen)")
    batch, hq, d = q.shape
    hkv, num_pages, page_size, _ = k_pool.shape
    if hq % hkv:
        raise ValueError(f"Hq={hq} must be a multiple of Hkv={hkv}")
    group = hq // hkv
    if page_size % QUANT_BLOCK and quantized:
        raise ValueError(f"page_size must be a multiple of {QUANT_BLOCK}")
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if window is not None and window < 1:
        raise ValueError("window must be >= 1")
    if interpret is None:
        interpret = interpret_default()
    max_pages = page_table.shape[1]
    lengths = lengths.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)
    windowed = window is not None or window_starts is not None
    if window_starts is None:
        # Raw (possibly negative) starts: the kernel mask is implicit
        # below 0; the index map clamps for page arithmetic.
        starts = ((lengths - window).astype(jnp.int32)
                  if windowed else jnp.zeros_like(lengths))
    else:
        starts = jnp.asarray(window_starts, jnp.int32)
    if qpos_spread > 1 and hq % qpos_spread:
        raise ValueError(
            f"qpos_spread={qpos_spread} must divide Hq={hq}")

    grid = (batch, max_pages)

    def q_index(b, p, lens, starts_, pt):
        return (b, 0, 0, 0)

    def pool_index(b, p, lens, starts_, pt):
        # Out-of-range steps re-DMA a live page (cheap, masked); with a
        # window the oldest visible page is the redirect target so
        # below-window pages never touch HBM.
        p_lo = 0
        run = p * page_size < lens[b]
        if windowed:
            s0 = jnp.maximum(starts_[b], 0)
            p_lo = s0 // page_size
            run = jnp.logical_and(run, (p + 1) * page_size > s0)
        p_live = lax.select(run, p, p_lo)
        return (0, pt[b, p_live], 0, 0)

    in_specs = [
        pl.BlockSpec((1, hkv, group, d), q_index),
        pl.BlockSpec((hkv, 1, page_size, d), pool_index),
        pl.BlockSpec((hkv, 1, page_size, d), pool_index),
    ]
    inputs = [q.reshape(batch, hkv, group, d), k_pool, v_pool]
    if quantized:
        in_specs += [
            pl.BlockSpec((hkv, 1, page_size // QUANT_BLOCK, d), pool_index),
            pl.BlockSpec((hkv, 1, page_size // QUANT_BLOCK, d), pool_index),
        ]
        inputs += [k_scales, v_scales]

    out_specs = [pl.BlockSpec((1, hkv, group, d), q_index)]
    out_shape = [jax.ShapeDtypeStruct((batch, hkv, group, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, hkv, group, LANES), q_index))
        out_shape.append(
            jax.ShapeDtypeStruct((batch, hkv, group, LANES), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _paged_kernel, scale=scale, page_size=page_size,
            max_pages=max_pages, quantized=quantized,
            save_stats=return_lse, windowed=windowed,
            qpos_spread=qpos_spread if windowed else 1,
            fold_scales=fold_scales,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hkv, group, LANES), jnp.float32),
                pltpu.VMEM((hkv, group, LANES), jnp.float32),
                pltpu.VMEM((hkv, group, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, starts, page_table, *inputs)
    o = outs[0].reshape(batch, hq, d)
    if return_lse:
        return o, outs[1][..., 0].reshape(batch, hq)
    return o


def validate_paged_inputs(k_pool, page_table, lengths, *, page_size=None):
    """checkify guards for the scalar-prefetch index path (the
    sanitizer analog SURVEY.md §5 calls for: Pallas index maps consult
    `page_table`/`lengths` to drive DMA, and an out-of-range page id
    would DMA arbitrary pool rows — the TPU equivalent of the unguarded
    OOB reads CUDA kernels risk; the reference's only guard was
    CHECK_CUDA after the fact).

    Call inside a `checkify.checkify(...)`-wrapped function (works
    under jit); `errors=checkify.user_checks`. Example:

        err, out = checkify.checkify(
            lambda *a: (validate_paged_inputs(kp, tbl, lens),
                        paged_flash_decode(*a))[1])(q, kp, vp, tbl, lens)
        err.throw()
    """
    from jax.experimental import checkify

    num_pages = k_pool.shape[1]
    ps = page_size or k_pool.shape[2]
    max_pages = page_table.shape[1]
    checkify.check(
        jnp.all((page_table >= 0) & (page_table < num_pages)),
        f"page_table contains out-of-range page ids "
        f"(pool has {num_pages} pages)")
    checkify.check(
        jnp.all((lengths >= 0) & (lengths <= max_pages * ps)),
        f"lengths exceed page-table capacity ({max_pages * ps} tokens)")


def paged_decode_reference(q, k_pool, v_pool, page_table, lengths, *,
                           k_scales=None, v_scales=None, scale=None,
                           window=None, window_starts=None):
    """Exact reference: gather pages into contiguous caches, then run the
    masked softmax in fp32."""
    from flash_attention_tpu.ops.decode import decode_reference
    hkv, num_pages, page_size, d = k_pool.shape
    batch = q.shape[0]
    max_pages = page_table.shape[1]

    def gather(pool, scales):
        # [Hkv, P, ps, D] -> [B, Hkv, max_pages*ps, D]
        g = pool[:, page_table]          # [Hkv, B, maxp, ps, D]
        g = jnp.moveaxis(g, 1, 0).reshape(
            batch, hkv, max_pages * page_size, d
        ).astype(jnp.float32)
        if scales is not None:
            sc = scales[:, page_table]   # [Hkv, B, maxp, ps/QB, D]
            sc = jnp.moveaxis(sc, 1, 0).reshape(
                batch, hkv, max_pages * (page_size // QUANT_BLOCK), 1, d
            )
            g = (g.reshape(batch, hkv, -1, QUANT_BLOCK, d) * sc).reshape(
                batch, hkv, max_pages * page_size, d
            )
        return g

    k = gather(k_pool, k_scales)
    v = gather(v_pool, v_scales)
    if window_starts is not None:
        return _reference_with_starts(
            q, k, v, lengths, jnp.asarray(window_starts), scale)
    return decode_reference(q, k, v, lengths, scale=scale,
                            window=window)


def _reference_with_starts(q, k, v, lengths, starts, scale):
    import numpy as _np
    batch, hq, d = q.shape
    _, hkv, s_len, _ = k.shape
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / _np.sqrt(d))
    kk = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kk) * scale
    col = jnp.arange(s_len)[None, None, :]
    bad = (col >= lengths[:, None, None]) | (col < starts[:, None, None])
    s = jnp.where(bad, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, vv).astype(q.dtype)
