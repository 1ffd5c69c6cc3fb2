"""Grouped (ragged) matmul over expert-sorted rows: y[i] = x[i] @ w[g(i)].

MoE performance kernel (no reference counterpart — the reference is a
single-GPU attention study, SURVEY.md §0). The capacity-routed MoE path
(models/moe.py) dispatches through dense one-hot [n, E, C] einsums whose
cost grows as O(n²·d) with sequence length; this kernel replaces them
for the serving path with the sort-based DROPLESS formulation:

  1. tokens' top-k expert assignments are sorted by expert id (one
     argsort over n·k int32 keys — static shapes, XLA sort);
  2. rows of the same expert are now contiguous; `group_sizes[e]` says
     how many;
  3. this kernel runs one ragged matmul: each row block multiplies
     against the expert weight its rows belong to.

The ragged iteration is the megablox idiom (the installed public
`jax.experimental.pallas.ops.tpu.megablox` is the ecosystem reference
for the *approach*; the kernel here is an original, simpler design):
a row tile can straddle an expert boundary, so the grid iterates a
VISIT list — (row tile, group) pairs, at most `m_tiles + E` of them —
computed on device from `group_sizes` and fed to the kernel through
scalar prefetch, where the visit's group id drives the weight-block
index map directly (the same "scalar is the DMA address" trick as
ops/paged.py's page tables). Rows outside the visit's group are masked
to zero; a tile visited by two groups accumulates across consecutive
visits in VMEM scratch.

Weight formats (one kernel body, static branches):
  * dense  — w [E, K, F] bf16/f32;
  * int8 / fp8 — w [E, K, F] quantized + per-(expert, out-channel)
    scales [E, F]; dequant fuses in-loop, HBM reads at quantized width
    (fp8 widens via the exact bit-plant, ops/quant.py);
  * int4 — packed [E, K/2, F] row-pair nibbles + group-wise scales
    [E, K/INT4_GROUP, F], the ops/quant_matmul.py int4 layout; the
    caller's x is de-interleaved into even/odd column planes.

Forward-only (serving); training keeps the capacity-routed path whose
gradients flow through plain einsums.
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
    VMEM_LIMIT_BYTES,
    cdiv,
    interpret_default,
    round_up,
)
from flash_attention_tpu.ops.quant import tile_to_f32
from flash_attention_tpu.ops.quant_matmul import INT4_GROUP

# plan[v] = (row_tile, dma_group, first_visit, run)
_PLAN_COLS = 4


def make_visit_plan(offsets, m_tiles: int, block_m: int, n_visits: int):
    """Build the visit list for a ragged row space.

    offsets: [G+1] int32 row offsets (monotone; offsets[0] may be > 0 —
    the tensor-parallel local-band case). Returns plan [n_visits, 4]
    int32 with columns (row_tile, dma_group, first_visit, run):

      * row_tile — which block_m tile of rows this visit covers;
      * dma_group — group id for the weight DMA. Always a VALID id:
        invalid (sentinel) visits forward-fill the previous group so
        their weight index map repeats an already-resident block and
        the DMA is skipped, not wasted;
      * first_visit — 1 iff this is the tile's first visit (zero the
        accumulator);
      * run — 1 iff the (tile, group) intersection is non-empty.

    Every tile gets >= 1 visit (padding tiles still need their zero
    store); a tile overlapping `c` groups gets `c` consecutive visits.
    n_visits must be >= m_tiles + G (the worst case: every internal
    group boundary splits a tile, plus one visit per tile).
    """
    g = offsets.shape[0] - 1
    offsets = offsets.astype(jnp.int32)
    starts = jnp.arange(m_tiles, dtype=jnp.int32) * block_m
    ends = starts + block_m
    # First group with offsets[g+1] > start; last group with
    # offsets[g] < end. Empty tiles yield g_hi < g_lo.
    g_lo = jnp.searchsorted(offsets[1:], starts, side="right")
    g_hi = jnp.searchsorted(offsets[:g], ends, side="left") - 1
    g_lo = g_lo.astype(jnp.int32)
    g_hi = g_hi.astype(jnp.int32)
    overlaps = g_hi - g_lo + 1
    counts = jnp.maximum(1, overlaps)
    first_of_tile = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    total = first_of_tile[-1] + counts[-1]

    v = jnp.arange(n_visits, dtype=jnp.int32)
    tile = jnp.clip(
        jnp.searchsorted(first_of_tile, v, side="right").astype(jnp.int32)
        - 1,
        0, m_tiles - 1,
    )
    within = v - first_of_tile[tile]
    group = g_lo[tile] + within
    run = (
        (v < total)
        & (within < overlaps[tile])
        & (group >= 0)
        & (group < g)
    )
    first = (within == 0) & (v < total)
    # Forward-fill the DMA group over invalid visits so their weight
    # index map lands on the block the pipeline already holds.
    dma = lax.associative_scan(
        jnp.maximum, jnp.where(run, group, -1)
    )
    dma = jnp.clip(dma, 0, g - 1)
    return jnp.stack(
        [tile, dma, first.astype(jnp.int32), run.astype(jnp.int32)],
        axis=1,
    )


def _grouped_kernel(offs_ref, plan_ref, *refs, num_groups, nk, block_m,
                    quant, rows_per_scale=0):
    if quant == "int4":
        xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_scr = refs
    elif quant == "int8":
        x_ref, w_ref, s_ref, o_ref, acc_scr = refs
    else:
        x_ref, w_ref, o_ref, acc_scr = refs
    v, kk = pl.program_id(1), pl.program_id(2)

    tile = plan_ref[v, 0]
    gd = plan_ref[v, 1]
    first = plan_ref[v, 2]
    run = plan_ref[v, 3]

    @pl.when(jnp.logical_and(kk == 0, first == 1))
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(run == 1)
    def _compute():
        row0 = tile * block_m
        start = offs_ref[gd]
        end = offs_ref[gd + 1]
        if quant == "int4":
            rows = lax.broadcasted_iota(
                jnp.int32, xe_ref.shape, 0) + row0
            keep = jnp.logical_and(rows >= start, rows < end)
            xe = jnp.where(keep, xe_ref[...], 0)
            xo = jnp.where(keep, xo_ref[...], 0)
            u = w_ref[0].astype(jnp.int32) & 0xFF
            lo = (((u & 0xF) ^ 8) - 8).astype(jnp.float32)
            hi = ((((u >> 4) & 0xF) ^ 8) - 8).astype(jnp.float32)
            bkp, bf = lo.shape
            ns = bkp // rows_per_scale
            # The block carries the expert's FULL scale table (tiny —
            # Mosaic requires sublane-divisible or full second-minor
            # blocks); slice this k-step's group rows dynamically.
            sc = s_ref[0, pl.ds(kk * ns, ns)]              # [ns, bf]
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
        else:
            rows = lax.broadcasted_iota(
                jnp.int32, x_ref.shape, 0) + row0
            keep = jnp.logical_and(rows >= start, rows < end)
            x = jnp.where(keep, x_ref[...], 0)
            if quant == "int8":
                # Per-(expert, channel) scale varies across visits that
                # share an accumulator tile, so it multiplies W in-loop
                # (one VPU op per tile), not the accumulator at store.
                w = (tile_to_f32(w_ref[0]) * s_ref[0]).astype(x.dtype)
            else:
                w = w_ref[0]
            acc_scr[...] += lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _store():
        # Unconditional: revisits of the same tile rewrite the block in
        # VMEM (flushed to HBM only when the block index changes).
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def _grouped_call(x_parts, w, scales, offsets, *, quant, out_dtype,
                  block_m, block_f, block_k, interpret, m, f, k_packed,
                  rows_per_scale=0):
    """Shared pallas_call plumbing. x_parts rows are already padded to a
    block_m multiple; k_packed counts the PACKED contraction rows (K/2
    for int4, K otherwise)."""
    e = w.shape[0]
    sub = SUBLANES.get(jnp.dtype(x_parts[0].dtype).itemsize, 8)
    bm = max(min(block_m, round_up(m, sub)), sub)
    bf = min(block_f, round_up(f, LANES))
    bk = min(block_k, round_up(k_packed, LANES))
    if quant == "int4":
        # The in-kernel scale slice starts at kk * (bk/rows_per_scale):
        # Mosaic needs sublane-aligned (multiple-of-8) dynamic vector
        # loads, so the block spans >= 8 scale groups unless it covers
        # the whole contraction (start 0, trivially aligned).
        min_bk = 8 * rows_per_scale
        bk = min(max(block_k, min_bk), round_up(k_packed, rows_per_scale))
        if bk < k_packed:
            bk = round_up(bk, min_bk)
    mp = round_up(m, bm)
    fp = round_up(f, bf)
    kp = round_up(k_packed, bk)
    x_parts = [
        jnp.pad(xp, ((0, mp - m), (0, kp - k_packed)))
        if (mp != m or kp != k_packed) else xp
        for xp in x_parts
    ]
    if kp != k_packed or fp != f:
        w = jnp.pad(w, ((0, 0), (0, kp - k_packed), (0, fp - f)))
    if scales is not None and quant == "int8" and fp != f:
        scales = jnp.pad(scales, ((0, 0), (0, fp - f)))
    if scales is not None and quant == "int4":
        spad = (kp - k_packed) // rows_per_scale
        if spad or fp != f:
            scales = jnp.pad(scales, ((0, 0), (0, spad), (0, fp - f)))
    nk = kp // bk
    m_tiles = mp // bm
    n_visits = m_tiles + e
    plan = make_visit_plan(offsets, m_tiles, bm, n_visits)
    if interpret is None:
        interpret = interpret_default()

    def x_index(j, v, kk, offs, plan_r):
        # Invalid visits keep the previous tile resident (the plan's
        # tile column is monotone, so the repeat costs no DMA).
        return (plan_r[v, 0], kk)

    def w_index(j, v, kk, offs, plan_r):
        return (plan_r[v, 1], kk, j)

    def s8_index(j, v, kk, offs, plan_r):
        return (plan_r[v, 1], 0, j)

    def s4_index(j, v, kk, offs, plan_r):
        return (plan_r[v, 1], 0, j)

    def o_index(j, v, kk, offs, plan_r):
        return (plan_r[v, 0], j)

    in_specs = [pl.BlockSpec((bm, bk), x_index)
                for _ in x_parts]
    inputs = list(x_parts)
    if quant == "int4":
        in_specs += [
            pl.BlockSpec((1, bk, bf), w_index),
            pl.BlockSpec((1, kp // rows_per_scale, bf), s4_index),
        ]
        inputs += [w, scales]
    elif quant == "int8":
        in_specs += [
            pl.BlockSpec((1, bk, bf), w_index),
            pl.BlockSpec((1, 1, bf), s8_index),
        ]
        inputs += [w, scales[:, None, :]]
    else:
        in_specs.append(pl.BlockSpec((1, bk, bf), w_index))
        inputs.append(w)

    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel, num_groups=e, nk=nk, block_m=bm,
            quant=quant, rows_per_scale=rows_per_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(fp // bf, n_visits, nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bf), o_index),
            scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, fp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(offsets, plan, *inputs)
    return out[:m, :f]


def _offsets(group_sizes, base=None):
    offs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(group_sizes.astype(jnp.int32)),
    ])
    if base is not None:
        offs = offs + jnp.asarray(base, jnp.int32)
    return offs


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def grouped_matmul(x, group_sizes, w, *, base=None, block_m=512,
                   block_f=2048, block_k=1024, interpret=None):
    """y[i] = x[i] @ w[g(i)] for rows sorted by group.

    x: [M, K] (rows of group g contiguous, groups in ascending order;
    rows beyond sum(group_sizes)+base produce zeros). group_sizes: [E]
    int32. w: [E, K, F] dense. base: optional row offset of group 0
    (tensor-parallel local band).
    """
    m, k = x.shape
    e, k2, f = w.shape
    if k != k2 or group_sizes.shape != (e,):
        raise ValueError(
            f"shape mismatch: x{x.shape} w{w.shape} gs{group_sizes.shape}")
    return _grouped_call(
        [x], w, None, _offsets(group_sizes, base), quant=None,
        out_dtype=x.dtype, block_m=block_m, block_f=block_f,
        block_k=block_k, interpret=interpret, m=m, f=f, k_packed=k)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def grouped_quant_matmul(x, group_sizes, w_q, w_scale, *, base=None,
                         block_m=512, block_f=2048, block_k=1024,
                         interpret=None):
    """Grouped matmul with int8/fp8 expert stacks: w_q [E, K, F],
    w_scale [E, F] per-(expert, out-channel). Dequant fused in-loop."""
    m, k = x.shape
    e, k2, f = w_q.shape
    if k != k2 or w_scale.shape != (e, f):
        raise ValueError(
            f"shape mismatch: x{x.shape} w{w_q.shape} s{w_scale.shape}")
    return _grouped_call(
        [x], w_q, w_scale.astype(jnp.float32),
        _offsets(group_sizes, base), quant="int8", out_dtype=x.dtype,
        block_m=block_m, block_f=block_f, block_k=block_k,
        interpret=interpret, m=m, f=f, k_packed=k)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_f", "block_k", "interpret"),
)
def grouped_int4_matmul(x, group_sizes, w_packed, w_scales, *, base=None,
                        block_m=512, block_f=2048, block_k=512,
                        interpret=None):
    """Grouped matmul with packed-int4 expert stacks: w_packed
    [E, K/2, F] row-pair nibbles, w_scales [E, K/INT4_GROUP, F]
    (ops/quant_matmul.py int4 layout). block_k counts PACKED rows."""
    m, k = x.shape
    e, kp2, f = w_packed.shape
    if k != 2 * kp2 or k % INT4_GROUP:
        raise ValueError(
            f"shape mismatch: x{x.shape} packed{w_packed.shape} "
            f"(K % {INT4_GROUP})")
    if w_scales.shape != (e, k // INT4_GROUP, f):
        raise ValueError(
            f"scales {w_scales.shape} != ({e}, {k // INT4_GROUP}, {f})")
    rows_per_scale = INT4_GROUP // 2
    return _grouped_call(
        [x[:, 0::2], x[:, 1::2]], w_packed, w_scales,
        _offsets(group_sizes, base), quant="int4", out_dtype=x.dtype,
        block_m=block_m, block_f=block_f, block_k=block_k,
        interpret=interpret, m=m, f=f, k_packed=kp2,
        rows_per_scale=rows_per_scale)


def grouped_matmul_reference(x, group_sizes, w):
    """Exact jnp reference (masked per-expert accumulation) for the
    self-verifying-pair tests (SURVEY.md §4)."""
    m = x.shape[0]
    offs = np.zeros(group_sizes.shape[0] + 1, np.int64)
    offs[1:] = np.cumsum(np.asarray(group_sizes))
    out = jnp.zeros((m, w.shape[2]), jnp.float32)
    rows = jnp.arange(m)
    for g in range(w.shape[0]):
        keep = (rows >= offs[g]) & (rows < offs[g + 1])
        xg = jnp.where(keep[:, None], x.astype(jnp.float32), 0.0)
        out = out + xg @ w[g].astype(jnp.float32)
    return out.astype(x.dtype)
