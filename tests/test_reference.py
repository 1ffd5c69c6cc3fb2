"""Reference attention self-consistency + metrics gates."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.reference import (
    attention_baseline,
    attention_reference,
    attention_reference_with_lse,
)
from flash_attention_tpu.utils.metrics import cross_check, verify


def test_reference_matches_numpy_softmax(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 64, 64, 32, jnp.float32)
    out = attention_reference(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(32)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_baseline_equals_reference(qkv_factory):
    q, k, v = qkv_factory(2, 4, 4, 128, 128, 64, jnp.float32)
    a = attention_reference(q, k, v, causal=True)
    b = attention_baseline(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_causal_mask_blocks_future(qkv_factory):
    q, k, v = qkv_factory(1, 1, 1, 8, 8, 32, jnp.float32)
    out = attention_reference(q, k, v, causal=True)
    # Row 0 attends only position 0 -> output equals v[0].
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), np.asarray(v[0, 0, 0]), atol=1e-6
    )


def test_gqa_expands_heads(qkv_factory):
    q, k, v = qkv_factory(1, 4, 2, 32, 32, 32, jnp.float32)
    out = attention_reference(q, k, v)
    # Heads 0,1 read kv head 0; heads 2,3 read kv head 1.
    kk = jnp.repeat(k, 2, axis=1)
    vv = jnp.repeat(v, 2, axis=1)
    expected = attention_reference(q, kk, vv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_lse_is_logsumexp(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 16, 16, 32, jnp.float32)
    _, lse = attention_reference_with_lse(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(32)
    expected = np.log(np.exp(s).sum(-1))
    np.testing.assert_allclose(np.asarray(lse), expected, rtol=1e-5, atol=1e-5)


def test_verify_gates():
    a = np.ones((4, 4), np.float32)
    report = verify(a, a)
    assert report.passed and report.max_rel_err == 0.0
    b = a * 1.1  # ~4.8% symmetric rel err > 2% gate
    report = verify(b, a)
    assert not report.passed
    assert report.num_offenders == 16
    assert "FAIL" in str(report)


def test_cross_check_pairs():
    a = np.ones((2, 2), np.float32)
    reports = cross_check({"x": a, "y": a, "z": a * 1.5})
    assert reports[("x", "y")].passed
    assert not reports[("x", "z")].passed
    assert len(reports) == 3


@pytest.mark.parametrize("offset_case", ["equal", "decode"])
def test_causal_offset(qkv_factory, offset_case):
    # Decode-style: Nq < Nk, the last q row sees the whole prefix.
    if offset_case == "equal":
        q, k, v = qkv_factory(1, 2, 2, 32, 32, 32, jnp.float32)
    else:
        q, k, v = qkv_factory(1, 2, 2, 4, 32, 32, jnp.float32)
    out = attention_reference(q, k, v, causal=True)
    # Last row: full attention over all kv.
    full = attention_reference(q[:, :, -1:], k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out[:, :, -1:]), np.asarray(full), atol=1e-6
    )
