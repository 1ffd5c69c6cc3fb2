"""Flash forward kernel vs exact reference (the reference-pair pattern,
SURVEY.md §4: seeded random inputs, symmetric-rel-err <2% gate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.flash import flash_attention, flash_attention_fwd
from flash_attention_tpu.ops.reference import (
    attention_lowp_baseline,
    attention_reference,
    attention_reference_with_lse,
)
from flash_attention_tpu.utils.metrics import verify, verify_low_precision

SMALL_BLOCKS = BlockSizes(
    block_q=128, block_kv=128, block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("head_dim", [64, 128])
def test_fwd_matches_reference(qkv_factory, causal, head_dim):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, head_dim, jnp.float32)
    out = flash_attention(q, k, v, causal=causal, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, causal=causal)
    report = verify(out, ref)
    assert report.passed, str(report)


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_bf16(qkv_factory, causal):
    # bf16 gate: kernel max-abs error vs fp32 reference must be within 3x
    # the error of a bf16 baseline with the same numerics (P rounded to
    # bf16 for the PV matmul). Symmetric rel-err is the wrong yardstick
    # on near-zero bf16 outputs.
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, causal=causal, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, causal=causal)
    base = attention_lowp_baseline(q, k, v, causal=causal)
    ok, kernel_err, base_err = verify_low_precision(out, ref, base)
    assert ok, f"kernel_err={kernel_err} vs baseline_err={base_err}"


def test_fwd_gqa(qkv_factory):
    q, k, v = qkv_factory(2, 8, 2, 256, 256, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_fwd_mqa(qkv_factory):
    q, k, v = qkv_factory(1, 4, 1, 128, 128, 64, jnp.float32)
    out = flash_attention(q, k, v, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_fwd_unpadded_seq(qkv_factory):
    # 200 and 300 are not multiples of the 128 blocks: exercises padding +
    # in-kernel length masking.
    q, k, v = qkv_factory(1, 2, 2, 200, 300, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_fwd_decode_shape(qkv_factory):
    # Nq < Nk with causal offset (the decode prefill-chunk case).
    q, k, v = qkv_factory(1, 2, 2, 128, 512, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_fwd_lse_matches_reference(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    _, lse = flash_attention_fwd(q, k, v, block_sizes=SMALL_BLOCKS)
    _, ref_lse = attention_reference_with_lse(q, k, v)
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), np.asarray(ref_lse), rtol=1e-4, atol=1e-4
    )


def test_fwd_larger_kv_block(qkv_factory):
    blocks = BlockSizes(block_q=128, block_kv=256)
    q, k, v = qkv_factory(1, 2, 2, 256, 512, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_sizes=blocks)
    ref = attention_reference(q, k, v, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_fwd_scale_override(qkv_factory):
    q, k, v = qkv_factory(1, 1, 1, 128, 128, 64, jnp.float32)
    out = flash_attention(q, k, v, scale=0.5, block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v, scale=0.5)
    report = verify(out, ref)
    assert report.passed, str(report)
