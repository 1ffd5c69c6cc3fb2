"""Sliding-window (local) attention: fwd/bwd vs windowed reference —
the Mistral/Gemma attention pattern (kernel-level; blocks fully outside
the window skip compute and DMA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.flash import flash_attention
from flash_attention_tpu.ops.reference import attention_reference
from flash_attention_tpu.utils.metrics import verify

SMALL = BlockSizes(block_q=128, block_kv=128, block_q_dq=128,
                   block_kv_dq=128, block_q_dkv=128, block_kv_dkv=128)


@pytest.mark.parametrize("window", [64, 128, 200, 999])
def test_window_fwd_matches_reference(qkv_factory, window):
    q, k, v = qkv_factory(1, 2, 2, 512, 512, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, window=window,
                          block_sizes=SMALL)
    ref = attention_reference(q, k, v, causal=True, window=window)
    assert verify(out, ref).passed


def test_window_fwd_decode_offset(qkv_factory):
    """Nq < Nk (decode-style offset) composes with the window."""
    q, k, v = qkv_factory(1, 2, 2, 128, 512, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, window=200,
                          block_sizes=SMALL)
    ref = attention_reference(q, k, v, causal=True, window=200)
    assert verify(out, ref).passed


@pytest.mark.parametrize("window", [96, 256])
def test_window_gradients_match_reference(qkv_factory, window):
    q, k, v = qkv_factory(1, 2, 2, 384, 384, 64, jnp.float32)

    def f_loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, window=window,
            block_sizes=SMALL) ** 2)

    def r_loss(q, k, v):
        return jnp.sum(attention_reference(
            q, k, v, causal=True, window=window) ** 2)

    g = jax.grad(f_loss, (0, 1, 2))(q, k, v)
    r = jax.grad(r_loss, (0, 1, 2))(q, k, v)
    for a, b, n in zip(g, r, "qkv"):
        rep = verify(a, b)
        assert rep.passed, f"d{n}: {rep}"


def test_window_requires_causal(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 128, 128, 64, jnp.float32)
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, k, v, window=64, block_sizes=SMALL)


def test_window_gqa_bf16(qkv_factory):
    from flash_attention_tpu.ops.reference import attention_lowp_baseline
    from flash_attention_tpu.utils.metrics import verify_low_precision
    q, k, v = qkv_factory(1, 4, 2, 256, 256, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, window=100,
                          block_sizes=SMALL)
    ref = attention_reference(q, k, v, causal=True, window=100)
    # Windowed low-precision baseline: reuse the reference on the
    # windowed mask by masking k/v is not possible; use plain max-abs
    # against the fp32 windowed reference with a generous bf16 bound.
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 1e-2, err
