"""Flash-decode kernel: ragged lengths, GQA, quantized KV."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.decode import decode_reference, flash_decode
from flash_attention_tpu.ops.quant import (
    QUANT_BLOCK,
    QuantizedTensor,
    dequantize_kv,
    quantization_error,
    quantize_kv,
)
from flash_attention_tpu.utils.metrics import verify


def make_decode_inputs(rng, batch, hq, hkv, s, d, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(0, 0.02, (batch, hq, d)), dtype)
    k = jnp.asarray(rng.normal(0, 0.02, (batch, hkv, s, d)), dtype)
    v = jnp.asarray(rng.normal(0, 0.02, (batch, hkv, s, d)), dtype)
    return q, k, v


def test_quantize_roundtrip_int8(rng):
    x = jnp.asarray(rng.normal(0, 0.02, (1, 2, 256, 64)), jnp.float32)
    err = quantization_error(x, dtype=jnp.int8)
    # int8 with block-channel scales: error <= absmax/127 per channel.
    assert err < 0.02 / 127 * 4


def test_quantize_roundtrip_fp8(rng):
    x = jnp.asarray(rng.normal(0, 0.02, (1, 2, 256, 64)), jnp.float32)
    err = quantization_error(x, dtype=jnp.float8_e4m3fn)
    # e4m3: 3 mantissa bits -> rel err <= 2^-4 of the element magnitude;
    # worst case at the block absmax (~5 sigma of N(0,0.02)).
    assert err < 0.02 * 5 * 2 ** -3.5


def test_quantize_scale_shapes(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 512, 128)), jnp.float32)
    qt = quantize_kv(x)
    assert qt.values.shape == x.shape and qt.values.dtype == jnp.int8
    assert qt.scales.shape == (2, 4, 512 // QUANT_BLOCK, 128)
    assert jnp.max(jnp.abs(dequantize_kv(qt, jnp.float32) - x)) < 1 / 127 * 8


def test_decode_matches_reference_full_length(rng):
    q, k, v = make_decode_inputs(rng, 2, 4, 4, 512, 64)
    lengths = jnp.full((2,), 512, jnp.int32)
    out = flash_decode(q, k, v, lengths, block_kv=128)
    ref = decode_reference(q, k, v, lengths)
    assert verify(out, ref).passed


def test_decode_ragged_lengths(rng):
    q, k, v = make_decode_inputs(rng, 4, 4, 2, 512, 64)
    lengths = jnp.asarray([512, 130, 1, 257], jnp.int32)
    out = flash_decode(q, k, v, lengths, block_kv=128)
    ref = decode_reference(q, k, v, lengths)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_decode_mqa(rng):
    q, k, v = make_decode_inputs(rng, 2, 8, 1, 256, 128)
    lengths = jnp.asarray([256, 100], jnp.int32)
    out = flash_decode(q, k, v, lengths, block_kv=128)
    ref = decode_reference(q, k, v, lengths)
    assert verify(out, ref).passed


def test_decode_quantized_int8(rng):
    q, k, v = make_decode_inputs(rng, 2, 8, 2, 512, 64, jnp.bfloat16)
    qk, qv = quantize_kv(k), quantize_kv(v)
    lengths = jnp.asarray([512, 300], jnp.int32)
    out = flash_decode(q, qk, qv, lengths, block_kv=256)
    # Reference on the dequantized cache: isolates kernel error from
    # quantization error.
    ref = decode_reference(q, qk, qv, lengths)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_decode_quantized_fp8(rng):
    q, k, v = make_decode_inputs(rng, 1, 4, 4, 256, 64, jnp.bfloat16)
    qk = quantize_kv(k, dtype=jnp.float8_e4m3fn)
    qv = quantize_kv(v, dtype=jnp.float8_e4m3fn)
    lengths = jnp.asarray([200], jnp.int32)
    out = flash_decode(q, qk, qv, lengths, block_kv=128)
    ref = decode_reference(q, qk, qv, lengths)
    assert verify(out, ref).passed


def test_decode_quantization_accuracy_end_to_end(rng):
    # Quantized decode vs the UNQUANTIZED exact reference: total error
    # (kernel + quant) must stay within the 2%-style gate for int8.
    q, k, v = make_decode_inputs(rng, 2, 4, 2, 512, 128, jnp.float32)
    lengths = jnp.asarray([512, 384], jnp.int32)
    out = flash_decode(q, quantize_kv(k), quantize_kv(v), lengths,
                       block_kv=128)
    ref = decode_reference(q, k, v, lengths)
    report = verify(out, ref, pass_threshold=0.05)
    # Per-element rel-err is meaningless on near-zero outputs; the right
    # end-to-end gates are (a) abs error within the int8 error bound of
    # the V cache (|o_err| <= max|v|/127 since o is a convex combination
    # of v rows) and (b) small mean relative error.
    int8_bound = float(np.max(np.abs(np.asarray(v, np.float32)))) / 127
    assert report.max_abs_err < int8_bound, str(report)
    assert report.mean_rel_err < 0.02, str(report)


def test_decode_rejects_mixed_quant(rng):
    q, k, v = make_decode_inputs(rng, 1, 2, 2, 256, 64)
    with pytest.raises(ValueError, match="both be quantized"):
        flash_decode(q, quantize_kv(k), v, jnp.asarray([256], jnp.int32))


def test_decode_sliding_window_matches_reference(qkv_factory, rng):
    """Windowed decode: only the most recent `window` cached positions
    attend; out-of-window blocks skip (Mistral/Gemma serving)."""
    import jax.numpy as jnp
    from flash_attention_tpu.ops.decode import decode_reference, flash_decode
    from flash_attention_tpu.utils.metrics import verify
    B, HQ, HKV, S, D = 3, 4, 2, 1024, 64
    q = jnp.asarray(rng.normal(0, 0.02, (B, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, HKV, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, HKV, S, D)), jnp.float32)
    lengths = jnp.asarray([1024, 700, 130], jnp.int32)
    for window in (256, 300, 2000):
        got = flash_decode(q, k, v, lengths, window=window, block_kv=256)
        ref = decode_reference(q, k, v, lengths, window=window)
        rep = verify(got, ref)
        assert rep.passed, (window, str(rep))
