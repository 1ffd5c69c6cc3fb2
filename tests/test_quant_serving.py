"""Quantized (INT8/FP8) paged serving: cache round-trip fidelity,
engine liveness, and the north-star perplexity-delta gate
(BASELINE.json: ppl delta <= 0.05 at INT8/FP8 KV)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step_paged,
    init_params,
    prefill_kv,
)
from flash_attention_tpu.ops.paged import paged_flash_decode
from flash_attention_tpu.runtime.engine import Engine, Request
from flash_attention_tpu.runtime.kv_cache import LayeredPagedKVCache

CFG = LlamaConfig.tiny(dtype=jnp.float32)
PAGE = 128


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_cache_roundtrip_fidelity(rng, qdtype):
    """Prefill-write + several unaligned tail flushes into a quantized
    cache; attention vs the dense-truth must stay within quantization
    tolerance for N(0, 0.02^2) data."""
    L, HKV, D, T0 = 2, 2, 64, 150
    cache = LayeredPagedKVCache(
        n_layers=L, kv_heads=HKV, head_dim=D, num_pages=8,
        page_size=PAGE, max_seqs=2, tail_size=16, quant_dtype=qdtype,
        dtype=jnp.float32)
    truth_k = rng.normal(0, 0.02, (L, HKV, T0 + 40, D)).astype(np.float32)
    truth_v = rng.normal(0, 0.02, (L, HKV, T0 + 40, D)).astype(np.float32)
    sid = cache.add_sequence(
        jnp.asarray(truth_k[:, :, :T0]), jnp.asarray(truth_v[:, :, :T0]))
    # Three flushes at awkward counts (crossing block boundaries).
    written = T0
    for cnt in (7, 16, 11):
        for li in range(L):
            cache.k_tails[li] = cache.k_tails[li].at[0, :, :cnt, :].set(
                jnp.asarray(truth_k[li, :, written:written + cnt]))
            cache.v_tails[li] = cache.v_tails[li].at[0, :, :cnt, :].set(
                jnp.asarray(truth_v[li, :, written:written + cnt]))
        cache.flush_tails([sid, -1], [cnt, 0])
        written += cnt

    assert cache.length(sid) == written
    tables, lengths = cache.batch_state([sid], 3)
    q = jnp.asarray(rng.normal(0, 0.02, (1, HKV * 2, D)), jnp.float32)
    for li in range(L):
        got = paged_flash_decode(
            q, cache.k_pools[li], cache.v_pools[li], tables, lengths,
            k_scales=cache.k_scale_pools[li],
            v_scales=cache.v_scale_pools[li])
        from flash_attention_tpu.ops.decode import decode_reference
        ref = decode_reference(
            q, jnp.asarray(truth_k[li, None, :, :written]),
            jnp.asarray(truth_v[li, None, :, :written]), lengths)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        tol = 6e-3 if qdtype == jnp.int8 else 1.5e-2
        assert err <= tol, (li, err)


@pytest.mark.parametrize("qdtype", [jnp.int8])
def test_quant_engine_runs_and_matches_shape(params, rng, qdtype):
    prompt = list(rng.integers(0, CFG.vocab_size, 140))
    eng = Engine(params, CFG, max_batch=2, num_pages=16, page_size=PAGE,
                 tail_size=8, kv_quant_dtype=qdtype)
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=10)])
    assert len(c.tokens) == 10
    assert all(0 <= t < CFG.vocab_size for t in c.tokens)


def _teacher_forced_nll(params, tokens, cache, steps):
    """Average NLL of the true next tokens under paged decode."""
    sid = 0  # single sequence, seq id from add_sequence
    t0 = tokens.shape[0] - steps - 1
    max_pages = cache.pages_for(tokens.shape[0]) + 1
    nll, tail = [], 0
    sids = [cache._test_sid]
    for i in range(steps):
        tables, paged_lens = cache.batch_state(sids, max_pages)
        logits, cache.k_tails, cache.v_tails = decode_step_paged(
            params, jnp.asarray([tokens[t0 + i]]), CFG,
            cache.k_pools, cache.v_pools, cache.k_tails, cache.v_tails,
            tables, paged_lens, jnp.asarray([tail], jnp.int32),
            k_scales=cache.k_scale_pools, v_scales=cache.v_scale_pools)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll.append(-float(logp[0, tokens[t0 + i + 1]]))
        tail += 1
        if tail >= cache.tail_size:
            cache.flush_tails(sids, [tail])
            tail = 0
    return float(np.mean(nll))


@pytest.mark.parametrize("qdtype", [
    pytest.param(jnp.int8, marks=pytest.mark.slow),
    pytest.param(jnp.float8_e4m3fn, marks=pytest.mark.slow),
    jnp.float8_e5m2,
])
def test_quant_ppl_delta_gate(params, rng, qdtype):
    """North-star gate: teacher-forced perplexity delta of INT8/FP8
    paged KV vs dense paged KV must be <= 0.05."""
    steps, t0 = 12, 140
    tokens = np.asarray(
        rng.integers(0, CFG.vocab_size, t0 + steps + 1), np.int32)

    def build(quant):
        cache = LayeredPagedKVCache(
            n_layers=CFG.n_layers, kv_heads=CFG.n_kv_heads,
            head_dim=CFG.head_dim, num_pages=8, page_size=PAGE,
            max_seqs=1, tail_size=8,
            quant_dtype=quant, dtype=jnp.float32)
        _, ks, vs = prefill_kv(
            params, jnp.asarray(tokens[None, :t0]), CFG)
        cache._test_sid = cache.add_sequence(ks[:, 0], vs[:, 0])
        return cache

    nll_dense = _teacher_forced_nll(params, tokens, build(None), steps)
    nll_quant = _teacher_forced_nll(params, tokens, build(qdtype), steps)
    ppl_dense = float(np.exp(nll_dense))
    ppl_quant = float(np.exp(nll_quant))
    assert abs(ppl_quant - ppl_dense) <= 0.05 * max(ppl_dense, 1.0), (
        ppl_dense, ppl_quant)


def test_quant_flush_crossing_block_boundary_small_tail(rng):
    """Regression: tail_size < QUANT_BLOCK with a flush that crosses a
    128-token block boundary must requantize BOTH touched blocks (the
    old max-blocks bound corrupted the next slot's entries)."""
    L, HKV, D = 1, 2, 64
    cache = LayeredPagedKVCache(
        n_layers=L, kv_heads=HKV, head_dim=D, num_pages=8,
        page_size=PAGE, max_seqs=2, tail_size=8, quant_dtype=jnp.int8,
        dtype=jnp.float32)
    truth_k = rng.normal(0, 0.02, (L, HKV, 121 + 8, D)).astype(np.float32)
    truth_v = rng.normal(0, 0.02, (L, HKV, 121 + 8, D)).astype(np.float32)
    # Two live slots so a bad bound would cross slot entry regions.
    a = cache.add_sequence(jnp.asarray(truth_k[:, :, :121]),
                           jnp.asarray(truth_v[:, :, :121]))
    b = cache.add_sequence(jnp.asarray(truth_k[:, :, :121]),
                           jnp.asarray(truth_v[:, :, :121]))
    for sid_slot, sid in ((0, a), (1, b)):
        cache.k_tails[0] = cache.k_tails[0].at[sid_slot, :, :8, :].set(
            jnp.asarray(truth_k[0, :, 121:129]))
        cache.v_tails[0] = cache.v_tails[0].at[sid_slot, :, :8, :].set(
            jnp.asarray(truth_v[0, :, 121:129]))
    cache.flush_tails([a, b], [8, 8])   # 121..128 crosses block 0->1
    tables, lengths = cache.batch_state([a, b], 2)
    q = jnp.asarray(rng.normal(0, 0.02, (2, HKV * 2, D)), jnp.float32)
    from flash_attention_tpu.ops.decode import decode_reference
    got = paged_flash_decode(
        q, cache.k_pools[0], cache.v_pools[0], tables, lengths,
        k_scales=cache.k_scale_pools[0], v_scales=cache.v_scale_pools[0])
    for i in range(2):
        ref = decode_reference(
            q[i:i+1], jnp.asarray(truth_k[0, None, :, :129]),
            jnp.asarray(truth_v[0, None, :, :129]), lengths[i:i+1])
        err = float(jnp.max(jnp.abs(got[i:i+1].astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        assert err <= 6e-3, (i, err)


@pytest.mark.parametrize("qdtype", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_fp8_bit_plant_bf16_exact_all_codes(qdtype):
    """tile_to_bf16 (16-bit-domain bit-plant) must equal
    tile_to_f32(...).astype(bf16) bit-for-bit on every finite fp8 code —
    the decode kernels may use either form interchangeably."""
    from flash_attention_tpu.ops.quant import tile_to_bf16, tile_to_f32

    codes = jnp.arange(256, dtype=jnp.uint8)
    vals = jax.lax.bitcast_convert_type(codes, qdtype)
    a = tile_to_f32(vals).astype(jnp.bfloat16)
    b = tile_to_bf16(vals)
    finite = np.isfinite(np.asarray(vals.astype(jnp.float32)))
    abits = np.asarray(jax.lax.bitcast_convert_type(a, jnp.uint16))
    bbits = np.asarray(jax.lax.bitcast_convert_type(b, jnp.uint16))
    assert not ((abits != bbits) & finite).any()
