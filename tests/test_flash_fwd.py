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


# --- quantized-KV prefill (fused dequant in QK^T/PV) -----------------------


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_quantized_kv_matches_dequantized(qkv_factory, qdtype, causal):
    """The fused-dequant kernel must match the dense kernel run on the
    explicitly dequantized cache — isolating kernel error from
    quantization error."""
    from flash_attention_tpu.ops.flash import flash_attention_quantized
    from flash_attention_tpu.ops.quant import dequantize_kv, quantize_kv

    q, k, v = qkv_factory(1, 4, 2, 256, 256, 64, jnp.bfloat16)
    kq, vq = quantize_kv(k, dtype=qdtype), quantize_kv(v, dtype=qdtype)
    out = flash_attention_quantized(q, kq, vq, causal=causal,
                                    block_sizes=SMALL_BLOCKS)
    dense = flash_attention(q, dequantize_kv(kq), dequantize_kv(vq),
                            causal=causal, block_sizes=SMALL_BLOCKS)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - dense.astype(jnp.float32))))
    # Same math up to dequant rounding into bf16 tiles.
    assert err <= 3e-2, err


def test_fwd_quantized_kv_accuracy_vs_fp32(qkv_factory):
    """End-to-end: int8-KV attention vs the fp32 exact reference on the
    ORIGINAL kv — quantization noise included — must stay within the
    north-star-style tolerance for N(0, 0.02^2) inputs."""
    from flash_attention_tpu.ops.flash import flash_attention_quantized
    from flash_attention_tpu.ops.quant import quantize_kv

    q, k, v = qkv_factory(1, 4, 2, 384, 384, 64, jnp.bfloat16)
    out = flash_attention_quantized(
        q, quantize_kv(k), quantize_kv(v), block_sizes=SMALL_BLOCKS)
    ref = attention_reference(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err <= 5e-3, err


def test_fwd_quantized_rejects_mixed(qkv_factory):
    from flash_attention_tpu.ops.flash import flash_attention_fwd
    from flash_attention_tpu.ops.quant import quantize_kv

    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.bfloat16)
    with pytest.raises(ValueError, match="both"):
        flash_attention_fwd(q, quantize_kv(k), v)


def test_fwd_fp16_io(qkv_factory):
    """fp16 I/O path (the reference's storage dtype, SURVEY.md §2.3):
    same low-precision gate as bf16."""
    from flash_attention_tpu.ops.reference import (
        attention_lowp_baseline,
        attention_reference,
    )
    from flash_attention_tpu.utils.metrics import verify_low_precision

    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float16)
    o = flash_attention(q, k, v, causal=True)
    assert o.dtype == jnp.float16
    ok, ke, be = verify_low_precision(
        o, attention_reference(q, k, v, causal=True),
        attention_lowp_baseline(q, k, v, causal=True))
    assert ok, (ke, be)


@pytest.mark.parametrize("band,bq", [(128, 128), (256, 128)])
def test_fwd_split_matches_single_pass(qkv_factory, band, bq):
    """Two-pass causal split (mask-free strict-below bulk + fine-tiled
    diag_band pass + LSE merge) must reproduce the single-pass causal
    forward, including the merged LSE."""
    from flash_attention_tpu.config import BlockSizes
    from flash_attention_tpu.ops.flash import (
        flash_attention_fwd,
        flash_attention_fwd_split,
    )

    q, k, v = qkv_factory(1, 2, 2, 512, 512, 64, jnp.float32)
    want, wlse = flash_attention_fwd(
        q, k, v, causal=True,
        block_sizes=BlockSizes(block_q=128, block_kv=128))
    got, glse = flash_attention_fwd_split(
        q, k, v, band=band,
        block_sizes=BlockSizes(block_q=bq, block_kv=bq),
        diag_block_sizes=BlockSizes(block_q=128, block_kv=128),
        save_residuals=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(glse), np.asarray(wlse),
                               atol=1e-5)
