"""Exact (naive) attention references.

Role of the reference's naive baseline kernels and SDPA check:
  - `cuda_fa1/main.cu:136-242` / `run/test_flash_attn.cu:548-652`:
    two-pass exact softmax attention materializing the full [B,H,N,N]
    score tensor in HBM — here expressed as `jnp` ops compiled by XLA
    (the defining property is algorithmic exactness, not kernel craft).
  - `triton_fa2/FA2-triton.py:311-323`: fp32 SDPA reference.

These are the ground truth every flash kernel verifies against with the
gates in `utils/metrics.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Exact references must not let XLA degrade fp32 matmuls to bf16 passes.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _expand_kv_heads(k, num_q_heads: int):
    """GQA/MQA: repeat KV heads to match query heads ([B,Hkv,...] →
    [B,Hq,...]); query head h reads kv head h // (Hq // Hkv)."""
    num_kv_heads = k.shape[1]
    if num_kv_heads == num_q_heads:
        return k
    if num_q_heads % num_kv_heads:
        raise ValueError(f"Hq={num_q_heads} not a multiple of Hkv={num_kv_heads}")
    return jnp.repeat(k, num_q_heads // num_kv_heads, axis=1)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "window"))
def attention_reference(q, k, v, *, causal: bool = False,
                        scale: float | None = None,
                        window: int | None = None):
    """Exact attention in fp32, one-shot softmax.

    Args:
      q: [B, Hq, Nq, D]; k, v: [B, Hkv, Nk, D] (Hkv divides Hq — GQA/MQA).
      causal: mask scores where kv position > q position + (Nk - Nq).
      scale: softmax scale; defaults to 1/sqrt(D), applied to scores
        before the max-reduction (flashAttention.cu:96-102 contract).

    Returns output in q's dtype; all intermediate math in fp32.
    """
    orig_dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if window is not None and not causal:
        raise ValueError("sliding window requires causal=True")
    k = _expand_kv_heads(k, q.shape[1])
    v = _expand_kv_heads(v, q.shape[1])
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = _einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        nq, nk = s.shape[-2], s.shape[-1]
        offset = nk - nq
        row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        s = jnp.where(col > row + offset, -jnp.inf, s)
        if window is not None:
            s = jnp.where(col <= row + offset - window, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    o = _einsum("bhqk,bhkd->bhqd", p, vf)
    return o.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def attention_baseline(q, k, v, *, causal: bool = False, scale: float | None = None):
    """Two-pass exact softmax, written the way the naive CUDA baseline is
    (main.cu:136-203: pass 1 row-max, pass 2 exp/sum/weighted-sum) so the
    harness can benchmark a deliberately bandwidth-bound exact variant.
    Numerically identical to `attention_reference` up to fp32 rounding.
    """
    orig_dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    k = _expand_kv_heads(k, q.shape[1])
    v = _expand_kv_heads(v, q.shape[1])
    s = _einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal:
        nq, nk = s.shape[-2], s.shape[-1]
        offset = nk - nq
        row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        s = jnp.where(col > row + offset, -jnp.inf, s)
    m = jnp.max(s, axis=-1, keepdims=True)          # pass 1: row max
    p = jnp.exp(s - m)                              # pass 2: exp
    l = jnp.sum(p, axis=-1, keepdims=True)          #         row sum
    o = _einsum("bhqk,bhkd->bhqd", p / l, v.astype(jnp.float32))
    return o.astype(orig_dtype)


def attention_reference_with_lse(q, k, v, *, causal: bool = False,
                                 scale: float | None = None):
    """Exact attention that also returns the log-sum-exp rows [B,Hq,Nq]
    (fp32) — used to verify the flash kernels' saved softmax stats."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    k = _expand_kv_heads(k, q.shape[1])
    v = _expand_kv_heads(v, q.shape[1])
    s = _einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal:
        nq, nk = s.shape[-2], s.shape[-1]
        offset = nk - nq
        row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        s = jnp.where(col > row + offset, -jnp.inf, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = _einsum("bhqk,bhkd->bhqd", p / l, v.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0]
    return o.astype(q.dtype), lse


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def attention_lowp_baseline(q, k, v, *, causal: bool = False,
                            scale: float | None = None):
    """Low-precision baseline mirroring the flash kernels' numerics: fp32
    scores and softmax stats, probabilities rounded to the input dtype for
    the PV contraction (the MXU path). Used as the yardstick in the
    3x-error gate for bf16/fp16 kernels."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    k = _expand_kv_heads(k, q.shape[1])
    v = _expand_kv_heads(v, q.shape[1])
    s = _einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal:
        nq, nk = s.shape[-2], s.shape[-1]
        offset = nk - nq
        row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        s = jnp.where(col > row + offset, -jnp.inf, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = _einsum(
        "bhqk,bhkd->bhqd", (p / l).astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return pv.astype(q.dtype)
