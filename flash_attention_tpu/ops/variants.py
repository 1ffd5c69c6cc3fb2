"""Kernel-study variants: FA1-style, FA2 in-loop-normalization, naive.

The reference is a multi-DSL kernel *study* — several implementations of
the same op benchmarked against each other (SURVEY.md §0). This module
provides the TPU-native members of that study beside the flagship in
`ops/flash.py`:

  * `flash_attention_fa1` — FA1-style forward honoring the reference's
    contract (SURVEY.md §2.3): recurrence
    `l_new = e^{m_old-m_new} l_old + e^{m~-m_new} l~` with one final
    `O/l` normalization, stats saved as SEPARATE m and l tensors (the
    Triton kernel's choice, FA2-triton.py:90-93 — not the fused LSE),
    and tile sizes derivable from the `M` on-chip-memory knob via the
    FA1 tile law `Bc=ceil(M/4d), Br=min(Bc,d)` (flashAttention.cu:17-18)
    re-based on the VMEM budget.
  * `flash_attention_fa2_inloop` — the FA2-paper deliberate variant the
    Triton kernel implements (FA2-triton.py:75-84): the accumulator is
    kept NORMALIZED inside the loop, `acc = acc*alpha + pv*beta` with
    `alpha=(l_i e^{m_i-m_ij})/l_ij`, `beta=1/l_ij` — costs one extra
    divide per step, saves the final normalization.
  * `naive_attention_pallas` — exact two-pass softmax as a real kernel
    (the role of attention_baseline_kernel, main.cu:136-203): a first
    full KV sweep computes the row max, a second sweep the exp-sum and
    weighted accumulation. No online rescaling — algorithmically exact,
    deliberately bandwidth-heavy (every KV tile is read twice).

All variants are forward-only study kernels; training runs the flagship.
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
from flash_attention_tpu.ops.flash import (
    INIT_M,
    MASK_VALUE,
    _dimension_semantics,
    _mxu_precision,
)

__all__ = [
    "fa1_tile_sizes",
    "flash_attention_fa1",
    "flash_attention_fa2_inloop",
    "naive_attention_pallas",
]


def fa1_tile_sizes(m_budget_elems: int, head_dim: int) -> tuple[int, int]:
    """The FA1 tile law, re-based on element budget `M`:
    Bc = ceil(M / 4d), Br = min(Bc, d) — flashAttention.cu:17-18 /
    main.cu:293-295 — rounded up to lane multiples for the VPU/MXU.
    The reference's default M=4096 elements of smem; a TPU VMEM budget
    passes a proportionally larger M."""
    bc = cdiv(m_budget_elems, 4 * head_dim)
    br = min(bc, head_dim)
    return max(round_up(br, LANES), LANES), max(round_up(bc, LANES), LANES)


# ---------------------------------------------------------------------------
# FA1-style forward (separate m/l outputs, deferred normalization)
# ---------------------------------------------------------------------------


def _fa1_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                m_scr, l_scr, acc_scr,
                *, scale, num_kv_blocks, kv_len, kv_padded, precision):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale
    if kv_padded:
        col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * s.shape[1]
        s = jnp.where(col >= kv_len, MASK_VALUE, s)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_tilde = jnp.max(s, axis=1, keepdims=True)            # m~ of this tile
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_tilde, m_prev.shape))
    p = jnp.exp(s - m_tilde)                               # P~ vs tile max
    l_tilde = jnp.sum(p, axis=1, keepdims=True)            # l~
    # FA1 recurrence (flashAttention.cu:115-137):
    #   l_new = e^{m_old-m_new} l_old + e^{m~-m_new} l~
    alpha = jnp.exp(m_prev - m_new)
    beta = jnp.exp(jnp.broadcast_to(m_tilde, m_new.shape) - m_new)
    l_scr[...] = alpha * l_prev + beta * jnp.broadcast_to(
        l_tilde, l_prev.shape
    )
    m_scr[...] = m_new
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + beta[:, :1] * lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)
        m_ref[0, 0] = m_scr[...]
        l_ref[0, 0] = l_scr[...]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_sizes", "m_budget", "interpret"),
)
def flash_attention_fa1(q, k, v, *, scale=None, block_sizes=None,
                        m_budget=None, interpret=None):
    """FA1-style non-causal forward. Returns (o, m, l) with m and l as
    separate [B,H,Nq,128] lane-replicated fp32 stats (the reference's
    split-stat contract). `m_budget` (elements) engages the FA1 tile law
    instead of the VMEM autotuner — the TPU analog of the CLI `M` knob
    (main.cu:366-371)."""
    batch, hq, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    if hq != hkv:
        raise ValueError("fa1 study kernel is MHA-only (Hq == Hkv)")
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if interpret is None:
        interpret = interpret_default()
    if m_budget is not None:
        block_q, block_kv = fa1_tile_sizes(m_budget, d)
    else:
        if block_sizes is None:
            block_sizes = default_block_sizes(nq, nk, d,
                                              jnp.dtype(q.dtype).name)
        block_q, block_kv = block_sizes.block_q, block_sizes.block_kv
    block_q = min(block_q, round_up(nq, LANES))
    block_kv = min(block_kv, round_up(nk, LANES))

    nq_pad = round_up(nq, block_q)
    nk_pad = round_up(nk, block_kv)
    kv_padded = nk_pad != nk
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
    if kv_padded:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))

    num_kv_blocks = nk_pad // block_kv
    grid = (batch, hq, nq_pad // block_q, num_kv_blocks)

    def q_index(b, h, i, j):
        return (b, h, i, 0)

    def kv_index(b, h, i, j):
        return (b, h, j, 0)

    o, m, l = pl.pallas_call(
        functools.partial(
            _fa1_kernel, scale=scale, num_kv_blocks=num_kv_blocks,
            kv_len=nk, kv_padded=kv_padded,
            precision=_mxu_precision(q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, block_q, LANES), q_index),
            pl.BlockSpec((1, 1, block_q, LANES), q_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hq, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((batch, hq, nq_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((batch, hq, nq_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(q, k, v)
    return o[:, :, :nq], m[:, :, :nq], l[:, :, :nq]


# ---------------------------------------------------------------------------
# FA2 in-loop normalization variant
# ---------------------------------------------------------------------------


def _fa2_inloop_kernel(q_ref, k_ref, v_ref, o_ref,
                       m_scr, l_scr, acc_scr,
                       *, scale, causal, offset, block_q, block_kv,
                       num_kv_blocks, kv_len, kv_padded, precision):
    i, j = pl.program_id(2), pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    from flash_attention_tpu.ops.flash import _below_or_on_diag
    should_run = (
        _below_or_on_diag(i, block_q, j, block_kv, offset) if causal else True
    )

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        if causal:
            row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
            col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
            s = jnp.where(col > row + offset, MASK_VALUE, s)
        if kv_padded:
            col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
            s = jnp.where(col >= kv_len, MASK_VALUE, s)

        m_i = m_scr[...]
        l_i = l_scr[...]
        m_ij = jnp.maximum(
            m_i, jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                                  m_i.shape)
        )
        p = jnp.exp(s - m_ij[:, :1])
        l_ij = l_i * jnp.exp(m_i - m_ij) + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_i.shape
        )
        l_safe = jnp.where(l_ij == 0.0, 1.0, l_ij)
        # FA2-triton.py:75-84: keep the accumulator normalized each step.
        alpha = l_i * jnp.exp(m_i - m_ij) / l_safe
        beta = 1.0 / l_safe
        pv = lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv * beta[:, :1]
        m_scr[...] = m_ij
        l_scr[...] = l_ij

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)  # already normalized


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_sizes", "interpret"),
)
def flash_attention_fa2_inloop(q, k, v, *, causal=False, scale=None,
                               block_sizes=None, interpret=None):
    """FA2-paper in-loop-normalized forward (study variant)."""
    batch, hq, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    if hq % hkv:
        raise ValueError(f"Hq={hq} must be a multiple of Hkv={hkv}")
    group = hq // hkv
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    offset = nk - nq
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = default_block_sizes(
            nq, nk, d, jnp.dtype(q.dtype).name, causal)
    block_q = min(block_sizes.block_q, round_up(nq, LANES))
    block_kv = min(block_sizes.block_kv, round_up(nk, LANES))
    if nq % block_q or nk % block_kv:
        raise ValueError("fa2_inloop study kernel requires block-divisible "
                         f"shapes, got {nq=} {nk=} {block_q=} {block_kv=}")

    num_kv_blocks = nk // block_kv
    grid = (batch, hq, nq // block_q, num_kv_blocks)

    from flash_attention_tpu.ops.flash import _below_or_on_diag

    def q_index(b, h, i, j):
        return (b, h, i, 0)

    def kv_index(b, h, i, j):
        if causal:
            j = lax.select(
                _below_or_on_diag(i, block_q, j, block_kv, offset), j, 0
            )
        return (b, h // group, j, 0)

    return pl.pallas_call(
        functools.partial(
            _fa2_inloop_kernel, scale=scale, causal=causal, offset=offset,
            block_q=block_q, block_kv=block_kv,
            num_kv_blocks=num_kv_blocks, kv_len=nk, kv_padded=False,
            precision=_mxu_precision(q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_index),
        out_shape=jax.ShapeDtypeStruct((batch, hq, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Naive two-pass Pallas kernel
# ---------------------------------------------------------------------------


def _naive_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale, num_kv_blocks, precision):
    jj = pl.program_id(3)
    phase = jj // num_kv_blocks      # 0: row-max sweep, 1: exp/sum sweep

    @pl.when(jj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale

    @pl.when(phase == 0)
    def _pass1():
        m_scr[...] = jnp.maximum(
            m_scr[...],
            jnp.broadcast_to(jnp.max(s, axis=1, keepdims=True),
                             m_scr.shape),
        )

    @pl.when(phase == 1)
    def _pass2():
        v = v_ref[0, 0]
        p = jnp.exp(s - m_scr[:, :1])
        l_scr[...] += jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_scr.shape
        )
        acc_scr[...] += lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(jj == 2 * num_kv_blocks - 1)
    def _store():
        o_ref[0, 0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_sizes", "interpret")
)
def naive_attention_pallas(q, k, v, *, scale=None, block_sizes=None,
                           interpret=None):
    """Exact two-pass attention as a Pallas kernel: sweep all KV once for
    the row max, then again for exp/sum/PV. Reads every K/V tile twice —
    the honest kernel form of the naive baseline's algorithm without its
    [B,H,N,N] HBM score spill (which XLA memory limits would forbid at
    the big configs anyway; see perf_2_32_8192_128's 16.9 GB truncation).
    """
    batch, h, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    if h != hkv:
        raise ValueError("naive study kernel is MHA-only (Hq == Hkv); "
                         f"got Hq={h}, Hkv={hkv}")
    if scale is None:
        scale = float(1.0 / np.sqrt(d))
    if interpret is None:
        interpret = interpret_default()
    if block_sizes is None:
        block_sizes = default_block_sizes(nq, nk, d, jnp.dtype(q.dtype).name)
    block_q = min(block_sizes.block_q, round_up(nq, LANES))
    block_kv = min(block_sizes.block_kv, round_up(nk, LANES))
    if nq % block_q or nk % block_kv:
        raise ValueError("naive study kernel requires block-divisible shapes")

    num_kv_blocks = nk // block_kv
    grid = (batch, h, nq // block_q, 2 * num_kv_blocks)

    def q_index(b, h_, i, jj):
        return (b, h_, i, 0)

    def kv_index(b, h_, i, jj):
        return (b, h_, jj % num_kv_blocks, 0)

    return pl.pallas_call(
        functools.partial(
            _naive_kernel, scale=scale, num_kv_blocks=num_kv_blocks,
            precision=_mxu_precision(q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
            pl.BlockSpec((1, 1, block_kv, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_index),
        out_shape=jax.ShapeDtypeStruct((batch, h, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=_dimension_semantics(
            "parallel", "parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(q, k, v)
