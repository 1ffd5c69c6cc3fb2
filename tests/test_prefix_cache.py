"""Automatic prefix caching: allocator-level contract (native + Python
against the same scenario), chain-hash semantics, and engine-level
transcript parity + prefill savings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import LlamaConfig, init_params
from flash_attention_tpu.runtime.allocator import (
    PyAllocator,
    make_allocator,
)
from flash_attention_tpu.runtime.engine import Engine, Request
from flash_attention_tpu.runtime.kv_cache import page_chain_hashes

PAGE = 128
CFG = LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.mark.parametrize("alloc_fn", [
    lambda: make_allocator(8, PAGE, 4),   # native when buildable
    lambda: PyAllocator(8, PAGE, 4),
])
def test_allocator_prefix_cache_contract(alloc_fn):
    a = alloc_fn()
    sid = a.alloc(3 * PAGE)
    tbl, _ = a.page_table(sid, 3)
    assert a.cache_put(sid, [11, 22, 33]) == 3
    a.free(sid)
    # Cached pages count as free (capacity unaffected) yet match.
    assert a.free_pages == 8
    assert a.cache_stats() == {"cached_pages": 3, "evictable_pages": 3}
    m = a.cache_match([11, 22, 33])
    assert m == list(tbl[:3])
    assert a.cache_stats()["evictable_pages"] == 0   # acquired
    a.cache_release(m)
    # Chain stops at the first miss.
    assert a.cache_match([11, 99, 33]) == [m[0]]
    a.cache_release([m[0]])
    # alloc_prefixed transfers ownership of acquired pages.
    pg = a.cache_match([11, 22])
    sid2 = a.alloc_prefixed(2 * PAGE + 40, pg)
    t2, n2 = a.page_table(sid2, 3)
    assert list(t2[:2]) == pg and n2 == 3
    # Exhaust the free stack; the next alloc must EVICT the remaining
    # evictable page (hash 33) rather than fail.
    assert a.alloc(4 * PAGE) >= 0
    assert a.free_pages == 1
    assert a.alloc(PAGE) >= 0
    assert a.free_pages == 0
    # 11/22 are live+cached -> still matchable; 33 evicted -> chain cut.
    m2 = a.cache_match([11, 22, 33])
    assert m2 == pg
    a.cache_release(m2)
    # Refusing further allocs once truly exhausted.
    assert a.alloc(PAGE) == -1


def test_allocator_cow_never_mutates_registered_page():
    a = PyAllocator(4, PAGE, 2)
    sid = a.alloc(PAGE)                    # exactly one FULL page
    tbl, _ = a.page_table(sid, 1)
    assert a.cache_put(sid, [77]) == 1
    # Defensive: COW on a registered page copies even at refcount 1.
    page, src = a.cow_last_page(sid)
    assert src == int(tbl[0]) and page != int(tbl[0])


def test_page_chain_hashes_prefix_sensitivity():
    t1 = np.arange(3 * PAGE, dtype=np.int32)
    h1 = page_chain_hashes(t1, PAGE)
    assert len(h1) == 3 and (h1 != 0).all()
    # Same page content, different PREFIX -> different chain hash.
    t2 = t1.copy()
    t2[0] += 1
    h2 = page_chain_hashes(t2, PAGE)
    assert (h1 != h2).all()
    # Identical prefix -> identical chain.
    t3 = np.concatenate([t1[: 2 * PAGE], t1[:PAGE]])
    h3 = page_chain_hashes(t3, PAGE)
    assert list(h3[:2]) == list(h1[:2]) and h3[2] != h1[2]
    # Partial trailing page contributes no hash.
    assert len(page_chain_hashes(t1[: PAGE + 7], PAGE)) == 1


def _serve(params, prompts, n_new, **kw):
    kw.setdefault("num_pages", 32)
    eng = Engine(params, CFG, max_batch=2, page_size=PAGE, **kw)
    reqs = [Request(prompt=list(p), max_new_tokens=n_new)
            for p in prompts]
    by_id = {c.request_id: c for c in eng.run(reqs)}
    return [by_id[r.request_id].tokens for r in reqs], eng.stats


@pytest.mark.slow
def test_engine_prefix_cache_hit_and_parity(params, rng):
    """A repeated prompt hits the cache (prefill skips its full pages)
    and the transcript is identical to an uncached engine."""
    prompt = list(rng.integers(0, CFG.vocab_size, 2 * PAGE + 17))
    base, base_stats = _serve(params, [prompt, prompt], 6)
    assert base_stats.prefix_cached_tokens == 0
    got, stats = _serve(params, [prompt, prompt], 6, prefix_cache=True)
    assert got == base
    # Second request reused both full prompt pages.
    assert stats.prefix_cached_tokens == 2 * PAGE
    assert stats.prefill_tokens == base_stats.prefill_tokens - 2 * PAGE


@pytest.mark.slow
def test_engine_prefix_cache_partial_overlap(params, rng):
    """Prompts sharing one full page reuse it; diverging tails do not."""
    common = list(rng.integers(0, CFG.vocab_size, PAGE))
    p1 = common + list(rng.integers(0, CFG.vocab_size, 40))
    p2 = common + list(rng.integers(0, CFG.vocab_size, 55))
    base, _ = _serve(params, [p1, p2], 5)
    got, stats = _serve(params, [p1, p2], 5, prefix_cache=True)
    assert got == base
    assert stats.prefix_cached_tokens == PAGE


@pytest.mark.slow
def test_engine_prefix_cache_with_chunked_prefill(params, rng):
    """Sequential runs: registration happens at install, so a prompt
    re-served AFTER the first completes hits through the chunked
    machinery too (simultaneous submissions legitimately miss — the
    first copy is still mid-prefill when the second admits)."""
    prompt = list(rng.integers(0, CFG.vocab_size, 2 * PAGE + 9))
    base, _ = _serve(params, [prompt, prompt], 5)
    eng = Engine(params, CFG, max_batch=2, num_pages=32, page_size=PAGE,
                 prefix_cache=True, prefill_chunk=64, decode_chunk=2)
    got1 = eng.run([Request(prompt=list(prompt), max_new_tokens=5)])
    got2 = eng.run([Request(prompt=list(prompt), max_new_tokens=5)])
    assert [got1[0].tokens, got2[0].tokens] == base
    assert eng.stats.prefix_cached_tokens == 2 * PAGE


@pytest.mark.slow
def test_engine_prefix_cache_multi_turn(params, rng):
    """Turn 2's prompt = turn 1's prompt + completion: the generated
    pages registered at finish make the whole turn-1 transcript a cache
    hit."""
    p1 = list(rng.integers(0, CFG.vocab_size, PAGE - 8))
    n_new = 24                              # p1 + fed tokens > one page
    base, _ = _serve(params, [p1], n_new)
    out1 = base[0]
    p2 = p1 + out1[:-1] + [out1[-1]]        # continue the conversation
    eng = Engine(params, CFG, max_batch=2, num_pages=32, page_size=PAGE,
                 prefix_cache=True)
    r1 = Request(prompt=p1, max_new_tokens=n_new)
    assert [c.tokens for c in eng.run([r1])] == [out1]
    r2 = Request(prompt=p2, max_new_tokens=4)
    eng.run([r2])
    # The full page covering p1 + early generated tokens was reused.
    assert eng.stats.prefix_cached_tokens >= PAGE


@pytest.mark.slow
def test_engine_prefix_cache_under_eviction_pressure(params, rng):
    """A pool barely larger than the working set: cached pages get
    evicted and re-registered; transcripts stay correct throughout."""
    prompts = [list(rng.integers(0, CFG.vocab_size, PAGE + 11))
               for _ in range(4)]
    seq = prompts + prompts                 # revisit after churn
    base, _ = _serve(params, seq, 4, num_pages=32)
    got, stats = _serve(params, seq, 4, num_pages=32, prefix_cache=True)
    assert got == base
    assert stats.prefix_cached_tokens >= 0  # hits depend on eviction


def _serve_quant(params, prompts, n_new, **kw):
    eng = Engine(params, CFG, max_batch=2, num_pages=32, page_size=PAGE,
                 kv_quant_dtype=jnp.int8, **kw)
    reqs = [Request(prompt=list(p), max_new_tokens=n_new)
            for p in prompts]
    by_id = {c.request_id: c for c in eng.run(reqs)}
    return [by_id[r.request_id].tokens for r in reqs], eng.stats


@pytest.mark.slow
def test_engine_prefix_cache_quantized_pools(params, rng):
    """Cached pages hold QUANTIZED KV; the gather dequantizes for the
    prefix buffer and transcripts equal the uncached quantized engine."""
    prompt = list(rng.integers(0, CFG.vocab_size, 2 * PAGE + 13))
    base, _ = _serve_quant(params, [prompt, prompt], 5)
    got, stats = _serve_quant(params, [prompt, prompt], 5,
                              prefix_cache=True)
    assert got == base
    assert stats.prefix_cached_tokens == 2 * PAGE
