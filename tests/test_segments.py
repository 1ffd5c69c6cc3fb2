"""Packed-sequence (segment-ids) attention: fwd/bwd vs a masked exact
reference — multiple documents per row without cross-attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.flash import SegmentIds, flash_attention
from flash_attention_tpu.utils.metrics import verify

SMALL = BlockSizes(block_q=128, block_kv=128, block_q_dq=128,
                   block_kv_dq=128, block_q_dkv=128, block_kv_dkv=128)


def masked_reference(q, k, v, seg_q, seg_kv, causal):
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(q.shape[-1])
    nq, nk = s.shape[-2], s.shape[-1]
    if causal:
        row = jnp.arange(nq)[:, None]
        col = jnp.arange(nk)[None, :]
        s = jnp.where(col > row + (nk - nq), -jnp.inf, s)
    segmask = seg_q[:, None, :, None] == seg_kv[:, None, None, :]
    s = jnp.where(segmask, s, -jnp.inf)
    # A row whose segment matches nothing would be all -inf; our packing
    # always includes the diagonal under causal, so softmax is safe.
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf).astype(q.dtype)


def make_segments(rng, batch, n, max_docs=4):
    """Random monotone segment ids: n split into <=max_docs docs."""
    ids = np.zeros((batch, n), np.int32)
    for b in range(batch):
        cuts = np.sort(rng.choice(
            np.arange(1, n), size=rng.integers(1, max_docs), replace=False))
        ids[b] = np.searchsorted(cuts, np.arange(n), side="right")
    return jnp.asarray(ids)


@pytest.mark.parametrize("causal", [False, True])
def test_segments_fwd_matches_reference(qkv_factory, rng, causal):
    q, k, v = qkv_factory(2, 2, 2, 384, 384, 64, jnp.float32)
    seg = make_segments(rng, 2, 384)
    out = flash_attention(
        q, k, v, SegmentIds(seg, seg), causal=causal, block_sizes=SMALL)
    ref = masked_reference(q, k, v, seg, seg, causal)
    assert verify(out, ref).passed


def test_segments_block_internal_boundary(qkv_factory, rng):
    """A document boundary INSIDE a block (not block-aligned)."""
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    seg = jnp.asarray(
        np.concatenate([np.zeros(100), np.ones(156)])[None], jnp.int32)
    out = flash_attention(
        q, k, v, SegmentIds(seg, seg), causal=True, block_sizes=SMALL)
    ref = masked_reference(q, k, v, seg, seg, True)
    assert verify(out, ref).passed
    # Cross-document leakage check: zeroing doc 0's V must not change
    # doc 1's outputs.
    v2 = v.at[:, :, :100].set(0.0)
    out2 = flash_attention(
        q, k, v2, SegmentIds(seg, seg), causal=True, block_sizes=SMALL)
    np.testing.assert_allclose(np.asarray(out[:, :, 100:]),
                               np.asarray(out2[:, :, 100:]),
                               rtol=0, atol=0)


def test_segments_gradients_match_reference(qkv_factory, rng):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    seg = make_segments(rng, 1, 256)

    def f_loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, SegmentIds(seg, seg), causal=True,
            block_sizes=SMALL) ** 2)

    def r_loss(q, k, v):
        return jnp.sum(masked_reference(q, k, v, seg, seg, True) ** 2)

    g = jax.grad(f_loss, (0, 1, 2))(q, k, v)
    r = jax.grad(r_loss, (0, 1, 2))(q, k, v)
    for a, b, n in zip(g, r, "qkv"):
        rep = verify(a, b)
        assert rep.passed, f"d{n}: {rep}"


def test_segments_compose_with_window(qkv_factory, rng):
    q, k, v = qkv_factory(1, 2, 2, 384, 384, 64, jnp.float32)
    seg = make_segments(rng, 1, 384)
    out = flash_attention(q, k, v, SegmentIds(seg, seg), causal=True,
                          window=100, block_sizes=SMALL)
    # window + segment reference
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / 8.0
    row = jnp.arange(384)[:, None]
    col = jnp.arange(384)[None, :]
    s = jnp.where(col > row, -jnp.inf, s)
    s = jnp.where(col <= row - 100, -jnp.inf, s)
    s = jnp.where(seg[:, None, :, None] == seg[:, None, None, :], s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd",
                     jax.nn.softmax(s, axis=-1), vf).astype(q.dtype)
    assert verify(out, ref).passed


def test_segments_shape_validation(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 128, 128, 64, jnp.float32)
    bad = jnp.zeros((1, 64), jnp.int32)
    with pytest.raises(ValueError, match="segment id shapes"):
        flash_attention(q, k, v, SegmentIds(bad, bad), causal=True,
                        block_sizes=SMALL)


def test_fully_masked_segment_rows_zero_output_and_grads(qkv_factory):
    """A q document absent from kv must output exactly 0 with zero
    gradients — not mean(v) with cross-mask gradient leakage (the
    INIT_M > MASK_VALUE invariant; regression for a confirmed bug)."""
    q, k, v = qkv_factory(1, 2, 2, 128, 128, 64, jnp.float32)
    seg_q = jnp.full((1, 128), 7, jnp.int32)
    seg_kv = jnp.zeros((1, 128), jnp.int32)

    out = flash_attention(q, k, v, SegmentIds(seg_q, seg_kv),
                          block_sizes=SMALL)
    assert float(jnp.max(jnp.abs(out))) == 0.0

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, SegmentIds(seg_q, seg_kv), block_sizes=SMALL) ** 2),
        (0, 1, 2))(q, k, v)
    for x, n in zip(g, "qkv"):
        assert float(jnp.max(jnp.abs(x))) == 0.0, n
