"""Study-kernel variants vs exact reference + all-pairs cross-check
(the reference's 4-way integration test, test_flash_attn.cu:168-347)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.dispatch import (
    CAUSAL_CAPABLE,
    IMPLEMENTATIONS,
    get_attention_impl,
    validate_head_dim,
)
from flash_attention_tpu.ops.reference import (
    attention_reference,
    attention_reference_with_lse,
)
from flash_attention_tpu.ops.variants import (
    fa1_tile_sizes,
    flash_attention_fa1,
    flash_attention_fa2_inloop,
    naive_attention_pallas,
)
from flash_attention_tpu.utils.metrics import cross_check, verify

BLOCKS = BlockSizes(block_q=128, block_kv=128)


def test_fa1_tile_law():
    # Bc=ceil(M/4d), Br=min(Bc,d), lane-aligned (flashAttention.cu:17-18).
    br, bc = fa1_tile_sizes(4096 * 64, 64)   # Bc=1024, Br=64->128
    assert (br, bc) == (128, 1024)
    br, bc = fa1_tile_sizes(4096, 128)       # Bc=8 -> 128 floor
    assert (br, bc) == (128, 128)


def test_fa1_matches_reference(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    o, m, l = flash_attention_fa1(q, k, v, block_sizes=BLOCKS)
    ref = attention_reference(q, k, v)
    assert verify(o, ref).passed
    # m + log(l) must equal the true LSE.
    _, ref_lse = attention_reference_with_lse(q, k, v)
    lse = np.asarray(m[..., 0]) + np.log(np.asarray(l[..., 0]))
    np.testing.assert_allclose(lse, np.asarray(ref_lse), rtol=1e-4, atol=1e-4)


def test_fa1_m_budget_knob(qkv_factory):
    q, k, v = qkv_factory(1, 1, 1, 256, 256, 64, jnp.float32)
    o, _, _ = flash_attention_fa1(q, k, v, m_budget=4 * 64 * 128)
    assert verify(o, attention_reference(q, k, v)).passed


@pytest.mark.parametrize("causal", [False, True])
def test_fa2_inloop_matches_reference(qkv_factory, causal):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    o = flash_attention_fa2_inloop(q, k, v, causal=causal, block_sizes=BLOCKS)
    assert verify(o, attention_reference(q, k, v, causal=causal)).passed


def test_fa2_inloop_gqa(qkv_factory):
    q, k, v = qkv_factory(1, 4, 2, 256, 256, 64, jnp.float32)
    o = flash_attention_fa2_inloop(q, k, v, causal=True, block_sizes=BLOCKS)
    assert verify(o, attention_reference(q, k, v, causal=True)).passed


def test_naive_pallas_matches_reference(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    o = naive_attention_pallas(q, k, v, block_sizes=BLOCKS)
    assert verify(o, attention_reference(q, k, v)).passed


def test_four_way_cross_check(qkv_factory):
    """The reference's integration pattern: run every study impl on the
    same seeded input, compare all pairs, 2% gate."""
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    outs = {}
    for name in ("baseline_xla", "naive_pallas", "fa1", "fa2_inloop",
                 "flash"):
        impl = get_attention_impl(name)
        kwargs = {"block_sizes": BLOCKS} if name not in (
            "baseline_xla", "reference_exact") else {}
        outs[name] = impl(q, k, v, **kwargs)
    reports = cross_check(outs)
    failed = {pair: str(r) for pair, r in reports.items() if not r.passed}
    assert not failed, failed


def test_dispatch_registry():
    assert set(CAUSAL_CAPABLE) <= set(IMPLEMENTATIONS)
    with pytest.raises(ValueError, match="unknown implementation"):
        get_attention_impl("wmma")
    validate_head_dim(128)
    with pytest.raises(ValueError, match="Unsupported head_dim"):
        validate_head_dim(96)


def test_fixed_tile_kernels(qkv_factory):
    """C15 role: frozen-tile standalone kernels — head-dim gated, match
    the exact reference within the 2% gate, causal-capable."""
    from flash_attention_tpu.ops.reference import attention_reference
    from flash_attention_tpu.utils.metrics import verify

    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    impl = get_attention_impl("flash_fixed_d64")
    r = verify(impl(q, k, v), attention_reference(q, k, v))
    assert r.passed, str(r)
    r = verify(impl(q, k, v, causal=True),
               attention_reference(q, k, v, causal=True))
    assert r.passed, str(r)
    with pytest.raises(ValueError, match="fixed to head_dim 64"):
        impl(*qkv_factory(1, 2, 2, 128, 128, 32, jnp.float32))

    q32, k32, v32 = qkv_factory(1, 2, 2, 256, 256, 32, jnp.float32)
    d32 = get_attention_impl("flash_fixed_d32")
    r = verify(d32(q32, k32, v32), attention_reference(q32, k32, v32))
    assert r.passed, str(r)
