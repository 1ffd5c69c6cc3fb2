"""Continuous-batching engine: correctness vs the contiguous decode
path, slot recycling, page accounting, admission under memory pressure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    init_params,
)
from flash_attention_tpu.models.sampling import generate
from flash_attention_tpu.runtime.engine import Completion, Engine, Request

CFG = LlamaConfig.tiny(dtype=jnp.float32)
PAGE = 128  # QUANT_BLOCK-aligned


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def make_engine(params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("num_pages", 32)
    kw.setdefault("page_size", PAGE)
    return Engine(params, CFG, **kw)


def ref_greedy(params, prompt, n):
    """Reference generation through the contiguous-cache path."""
    out = generate(params, jnp.asarray([prompt], jnp.int32), CFG,
                   max_new_tokens=n)
    return [int(x) for x in np.asarray(out[0])]


def test_engine_matches_contiguous_greedy(params, rng):
    prompts = [
        list(rng.integers(0, CFG.vocab_size, 7)),
        list(rng.integers(0, CFG.vocab_size, 20)),
        list(rng.integers(0, CFG.vocab_size, 13)),
    ]
    eng = make_engine(params)
    reqs = [Request(prompt=p, max_new_tokens=6) for p in prompts]
    completions = eng.run(reqs)
    assert len(completions) == 3
    by_id = {c.request_id: c for c in completions}
    for req, prompt in zip(reqs, prompts):
        got = by_id[req.request_id].tokens
        want = ref_greedy(params, prompt, 6)
        assert got == want, (got, want)
        assert by_id[req.request_id].finish_reason == "length"
        assert by_id[req.request_id].prompt_len == len(prompt)


@pytest.mark.slow
def test_engine_more_requests_than_slots(params, rng):
    """Requests beyond max_batch queue up and recycle freed slots."""
    prompts = [list(rng.integers(0, CFG.vocab_size, 5 + i))
               for i in range(7)]
    eng = make_engine(params, max_batch=2, num_pages=16)
    free0 = eng.cache.free_pages
    completions = eng.run(
        [Request(prompt=p, max_new_tokens=3) for p in prompts])
    assert len(completions) == 7
    for c, p in zip(completions, prompts):
        assert c.tokens == ref_greedy(params, p, 3)
    # All pages returned after completion.
    assert eng.cache.free_pages == free0


def test_engine_eos_stops_early(params, rng):
    prompt = list(rng.integers(0, CFG.vocab_size, 9))
    want = ref_greedy(params, prompt, 8)
    eos = want[2]
    eng = make_engine(params)
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=8, eos_id=eos)])
    assert c.finish_reason == "stop"
    # Generation must stop at the FIRST occurrence of eos.
    assert c.tokens == want[: want.index(eos) + 1]


@pytest.mark.slow
def test_engine_page_boundary_crossing(params, rng):
    """Generation that crosses a page boundary stays correct."""
    t = PAGE - 2
    prompt = list(rng.integers(0, CFG.vocab_size, t))
    eng = make_engine(params, num_pages=8)
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=6)])
    assert c.tokens == ref_greedy(params, prompt, 6)


@pytest.mark.slow
def test_engine_admission_defers_under_pressure(params, rng):
    """With pages for only one worst-case sequence, requests serialize
    but all complete."""
    prompts = [list(rng.integers(0, CFG.vocab_size, PAGE + 10))
               for _ in range(3)]
    # Each request worst-case needs ceil((138+4)/128)=2 pages; pool of 3
    # usable pages (one is scratch-reserved at init from num_pages=4).
    eng = make_engine(params, max_batch=4, num_pages=4)
    completions = eng.run(
        [Request(prompt=p, max_new_tokens=4) for p in prompts])
    assert len(completions) == 3
    for c, p in zip(sorted(completions, key=lambda c: c.request_id),
                    prompts):
        assert c.tokens == ref_greedy(params, p, 4)


@pytest.mark.slow
def test_engine_temperature_sampling_runs(params, rng):
    """Stochastic path: shapes/liveness only (no fixed-point contract)."""
    prompt = list(rng.integers(0, CFG.vocab_size, 6))
    eng = make_engine(params)
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=5,
                            temperature=0.8)])
    assert len(c.tokens) == 5
    assert all(0 <= t < CFG.vocab_size for t in c.tokens)


def test_engine_rejects_oversized_request(params):
    """Infeasible requests fail as rejected COMPLETIONS, never as an
    exception out of step()/run() — the server survives the request."""
    eng = make_engine(params, num_pages=4)
    eng.submit(Request(prompt=[1] * 10, max_new_tokens=10_000))
    done = eng.step()
    (rej,) = [c for c in done if c.finish_reason == "rejected"]
    assert rej.tokens == [] and "infeasible" in rej.error
    assert not eng.pending              # rejected request was dequeued
    # n > max_batch is also infeasible, not an infinite admission wait.
    eng.submit(Request(prompt=[1] * 4, max_new_tokens=2,
                       n=eng.max_batch + 1))
    (rej2,) = [c for c in eng.step() if c.finish_reason == "rejected"]
    assert "infeasible" in rej2.error
    assert eng.stats.rejected == 2
    # A mixed batch through run(): feasible requests complete normally,
    # the infeasible one comes back rejected, nothing is lost.
    out = eng.run([
        Request(prompt=[1, 2, 3], max_new_tokens=2),
        Request(prompt=[2] * 10, max_new_tokens=10_000),
        Request(prompt=[4, 5], max_new_tokens=2),
    ])
    assert len(out) == 3
    ok = [c for c in out if c.finish_reason != "rejected"]
    bad = [c for c in out if c.finish_reason == "rejected"]
    assert len(ok) == 2 and all(len(c.tokens) == 2 for c in ok)
    assert len(bad) == 1 and bad[0].prompt_len == 10


def test_precompile_decode_keeps_transcripts(params, rng):
    """precompile_decode's dummy dispatches (garbage tail writes) must
    not perturb later transcripts; probe_prefix must not leak pages."""
    prompt = list(rng.integers(0, CFG.vocab_size, 7))
    eng = make_engine(params, prefix_cache=True)
    assert eng.precompile_decode() >= 1
    free0 = eng.cache.free_pages
    assert eng.probe_prefix(prompt) == 0        # cold cache, no hit
    assert eng.cache.free_pages == free0        # pages released
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=4)])
    assert c.tokens == ref_greedy(params, prompt, 4)
    # After serving, the prompt's pages are cached; probe reports the
    # page-aligned hit without consuming pages.
    free1 = eng.cache.free_pages
    hit = eng.probe_prefix(prompt + [1, 2, 3])
    assert hit % PAGE == 0
    assert eng.cache.free_pages == free1


def test_engine_tail_flush_exactness(params, rng):
    """Force many tail->page flushes (tail_size 4, 13 generated tokens)
    and cross a page boundary mid-generation; output must stay exact."""
    prompt = list(rng.integers(0, CFG.vocab_size, PAGE - 3))
    eng = make_engine(params, num_pages=8, tail_size=4)
    (c,) = eng.run([Request(prompt=prompt, max_new_tokens=13)])
    assert c.tokens == ref_greedy(params, prompt, 13)


@pytest.mark.slow
def test_engine_tail_flush_mixed_slots(params, rng):
    """Flush with a mix of live, finished, and freshly admitted slots."""
    prompts = [list(rng.integers(0, CFG.vocab_size, 5 + 3 * i))
               for i in range(5)]
    eng = make_engine(params, max_batch=2, num_pages=16, tail_size=3)
    lens = [9, 2, 7, 3, 11]
    comps = eng.run([
        Request(prompt=p, max_new_tokens=n)
        for p, n in zip(prompts, lens)])
    assert len(comps) == 5
    for c, p, n in zip(sorted(comps, key=lambda c: c.request_id),
                       prompts, lens):
        assert c.tokens == ref_greedy(params, p, n)


@pytest.mark.slow
def test_engine_chunked_decode_matches_greedy(params, rng):
    """decode_chunk > 1 (one dispatch per chunk, on-device resampling)
    must produce identical greedy outputs, including eos mid-chunk and
    flushes between chunks."""
    prompts = [list(rng.integers(0, CFG.vocab_size, n))
               for n in (7, 130, 13)]
    want = [ref_greedy(params, p, 11) for p in prompts]
    eng = make_engine(params, tail_size=8, num_pages=32)
    eng.decode_chunk = 4
    comps = eng.run([Request(prompt=p, max_new_tokens=11)
                     for p in prompts])
    for c, w in zip(sorted(comps, key=lambda c: c.request_id), want):
        assert c.tokens == w
    # eos mid-chunk
    eos = want[0][5]
    eng2 = make_engine(params, tail_size=8)
    eng2.decode_chunk = 4
    (c,) = eng2.run([Request(prompt=prompts[0], max_new_tokens=11,
                             eos_id=eos)])
    assert c.tokens == want[0][: want[0].index(eos) + 1]


def test_cache_fork_cow_isolation(rng):
    """Two forked sequences flush DIFFERENT tokens through a shared
    boundary page; copy-on-write must isolate them."""
    from flash_attention_tpu.runtime.kv_cache import LayeredPagedKVCache
    L, HKV, D, T0 = 1, 2, 64, 100  # T0 not page-aligned: page 0 shared
    cache = LayeredPagedKVCache(
        n_layers=L, kv_heads=HKV, head_dim=D, num_pages=8,
        page_size=PAGE, max_seqs=2, tail_size=8, dtype=jnp.float32)
    base_k = rng.normal(0, 1, (L, HKV, T0, D)).astype(np.float32)
    base_v = rng.normal(0, 1, (L, HKV, T0, D)).astype(np.float32)
    a = cache.add_sequence(jnp.asarray(base_k), jnp.asarray(base_v))
    b = cache.fork_sequence(a)
    free_after_fork = cache.free_pages  # fork allocates nothing

    # Write different tail tokens for a and b, flush both at once.
    ka = rng.normal(0, 1, (HKV, 5, D)).astype(np.float32)
    kb = rng.normal(0, 1, (HKV, 5, D)).astype(np.float32)
    cache.k_tails[0] = cache.k_tails[0].at[0, :, :5, :].set(jnp.asarray(ka))
    cache.k_tails[0] = cache.k_tails[0].at[1, :, :5, :].set(jnp.asarray(kb))
    cache.v_tails[0] = cache.v_tails[0].at[0, :, :5, :].set(jnp.asarray(ka))
    cache.v_tails[0] = cache.v_tails[0].at[1, :, :5, :].set(jnp.asarray(kb))
    cache.flush_tails([a, b], [5, 5])
    # COW consumed exactly one page (b's copy of the shared last page).
    assert cache.free_pages == free_after_fork - 1

    pool = np.asarray(cache.k_pools[0])
    ta, _ = cache.allocator.page_table(a, 2)
    tb2, _ = cache.allocator.page_table(b, 2)
    assert ta[0] != tb2[0]  # diverged boundary page
    # Both retain the shared prefix and carry their own tail tokens.
    off = T0 % PAGE
    np.testing.assert_allclose(pool[:, ta[0], :off], base_k[0, :, :off],
                               rtol=0, atol=0)
    np.testing.assert_allclose(pool[:, tb2[0], :off], base_k[0, :, :off],
                               rtol=0, atol=0)
    np.testing.assert_allclose(pool[:, ta[0], off:off + 5], ka,
                               rtol=0, atol=0)
    np.testing.assert_allclose(pool[:, tb2[0], off:off + 5], kb,
                               rtol=0, atol=0)
    cache.free_sequence(a)
    cache.free_sequence(b)


@pytest.mark.slow
def test_engine_fork_n_greedy_branches_identical(params, rng):
    """n=3 greedy branches must all equal the reference generation and
    share prompt pages (cheaper than 3 independent admissions)."""
    prompt = list(rng.integers(0, CFG.vocab_size, PAGE + 20))
    want = ref_greedy(params, prompt, 9)
    eng = make_engine(params, max_batch=4, num_pages=16, tail_size=4)
    free0 = eng.cache.free_pages
    comps = eng.run([Request(prompt=prompt, max_new_tokens=9, n=3)])
    assert len(comps) == 3
    assert sorted(c.branch for c in comps) == [0, 1, 2]
    for c in comps:
        assert c.tokens == want
    assert eng.cache.free_pages == free0  # all pages reclaimed


@pytest.mark.slow
def test_engine_chunked_prefill_matches_greedy(params, rng):
    """Chunked prefill (TTFT path): transcripts identical to the
    monolithic-prefill engine, TTFT recorded per request."""
    prompts = [
        list(rng.integers(0, CFG.vocab_size, 100)),   # 4 chunks of 32
        list(rng.integers(0, CFG.vocab_size, 17)),    # single sub-chunk
    ]
    eng = make_engine(params, prefill_chunk=32)
    completions = eng.run(
        [Request(prompt=p, max_new_tokens=5) for p in prompts])
    assert len(completions) == 2
    by_len = {c.prompt_len: c for c in completions}
    for p in prompts:
        got = by_len[len(p)].tokens
        want = ref_greedy(params, p, 5)
        assert got == want, (got, want)
        assert by_len[len(p)].ttft_s is not None
        assert by_len[len(p)].ttft_s > 0
    assert eng.stats.ttft_percentiles()["p50"] > 0


@pytest.mark.slow
def test_engine_chunked_prefill_interleaves_decode(params, rng):
    """A long prompt admitted mid-stream must NOT stall live decode:
    once the batch is at least half occupied, live slots keep producing
    tokens between the new prompt's prefill chunks (below half
    occupancy the scheduler deliberately prefers filling the batch —
    an under-occupied decode dispatch costs the full weight read)."""
    eng = make_engine(params, prefill_chunk=32)      # max_batch = 4
    shorts = [list(rng.integers(0, CFG.vocab_size, n))
              for n in (7, 9, 11)]
    for p in shorts:
        eng.submit(Request(prompt=p, max_new_tokens=24))
    eng.step()                                 # admit 3 + first decode
    live_before = [s for s in eng.slots if s is not None]
    assert len(live_before) == 3, "short requests should be decoding"
    n_before = len(live_before[0].generated)

    p2 = list(rng.integers(0, CFG.vocab_size, 120))  # 4 chunks
    eng.submit(Request(prompt=p2, max_new_tokens=4))
    for _ in range(3):
        eng.step()                             # prefill chunks 1..3
    assert eng.prefilling, "long prompt should still be prefilling"
    live = [s for s in eng.slots if s is not None]
    assert live and len(live[0].generated) > n_before, (
        "decode stalled during chunked prefill")
    out = eng.run()
    by_len = {c.prompt_len: c for c in out}
    for p in shorts:
        assert by_len[len(p)].tokens == ref_greedy(params, p, 24)
    assert by_len[len(p2)].tokens == ref_greedy(params, p2, 4)


@pytest.mark.slow
def test_engine_fuzz_mixed_workload(params, rng):
    """Randomized mixed workload through every engine feature at once:
    varied prompt lengths, fork counts, EOS stops, chunked prefill +
    decode, prefix caching. Every branch-0 completion must equal the
    contiguous-cache greedy reference; greedy forks must agree with
    each other. Then the same workload through the SPECULATIVE engine
    must reproduce the plain engine's transcripts."""
    # Find a token the model actually emits, to use as a live EOS.
    probe = ref_greedy(params, [7, 11, 13], 6)
    eos = probe[2]

    lens = [3, 17, 60, 129, 140]
    reqs_spec = []
    for i in range(8):
        prompt = list(rng.integers(0, CFG.vocab_size, lens[i % len(lens)]))
        reqs_spec.append(dict(
            prompt=prompt,
            max_new_tokens=int(rng.integers(1, 14)),
            eos_id=eos if i % 3 == 0 else None,
            n=2 if i % 4 == 2 else 1,
        ))

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=3, num_pages=64,
                     page_size=PAGE, tail_size=16, **kw)
        reqs = [Request(**r) for r in reqs_spec]
        id2idx = {rq.request_id: i for i, rq in enumerate(reqs)}
        return [(id2idx[c.request_id], c) for c in eng.run(reqs)]

    comps = serve(prefill_chunk=32, decode_chunk=3, prefix_cache=True)
    by_key = {}
    for idx, c in comps:
        by_key.setdefault(idx, {})[c.branch] = c
    assert len(comps) == sum(r["n"] for r in reqs_spec)
    for (rid, branches), r in zip(sorted(by_key.items()), reqs_spec):
        want_full = ref_greedy(params, r["prompt"], r["max_new_tokens"])
        if r["eos_id"] is not None and r["eos_id"] in want_full:
            want = want_full[: want_full.index(r["eos_id"]) + 1]
        else:
            want = want_full
        for b, c in branches.items():
            assert c.tokens == want, (rid, b, c.tokens, want)

    # Speculative engine (greedy-only features; chunked decode off).
    comps_spec = serve(speculative_k=2, prefix_cache=True)
    got = sorted((i, c.branch, tuple(c.tokens)) for i, c in comps_spec)
    want = sorted((i, c.branch, tuple(c.tokens)) for i, c in comps)
    assert got == want


@pytest.mark.slow
def test_engine_non_pow2_prefill_chunk(params, rng):
    """Regression: a prefill_chunk that doesn't divide the bucket used
    to overflow the KV-buffer write (dynamic_update_slice clamps the
    start and silently corrupts earlier KV). Chunk sizes are now
    snapped to divide the suffix span."""
    prompt = list(rng.integers(0, CFG.vocab_size, 300))
    eng = make_engine(params, prefill_chunk=100, decode_chunk=2,
                      num_pages=32)
    got = eng.run([Request(prompt=list(prompt), max_new_tokens=5)])[0]
    assert got.tokens == ref_greedy(params, prompt, 5)


@pytest.mark.slow
def test_engine_top_p_sampling(params, rng):
    """Nucleus sampling through the engine (host path AND fused chunk
    path): tokens stay inside the per-step nucleus of the greedy run's
    distribution support; deterministic seeds reproduce."""
    prompt = list(rng.integers(0, CFG.vocab_size, 12))

    def serve(chunk):
        eng = make_engine(params, decode_chunk=chunk, seed=7)
        return eng.run([Request(prompt=list(prompt), max_new_tokens=6,
                                temperature=0.8, top_p=0.9)])[0].tokens

    a1 = serve(1)
    a2 = serve(1)
    assert a1 == a2                    # same seed -> same sample path
    c1 = serve(4)                      # fused on-device chunk path runs
    assert len(c1) == 6


def test_engine_precompile_chunked_prefill(params, rng):
    """Shape-bucket warmup: every pow2 prefill group size compiles up
    front (open-loop arrivals produce queue-depth-dependent group
    sizes; a cold compile mid-serve poisons TTFT), and the engine
    serves identically afterwards."""
    eng = make_engine(params, max_batch=2, prefill_chunk=64,
                      decode_chunk=2)
    assert eng.precompile_chunked_prefill(200) == 2  # g = 1, 2
    prompts = [list(rng.integers(0, CFG.vocab_size, 190 + i))
               for i in range(2)]
    out = eng.run([Request(prompt=p, max_new_tokens=4) for p in prompts])
    want = {len(p): ref_greedy(params, p, 4) for p in prompts}
    assert {c.prompt_len: c.tokens for c in out} == want
    # no-op when chunked prefill is off
    assert make_engine(params).precompile_chunked_prefill(200) == 0


def test_engine_step_trace(params, rng):
    """Engine.trace records (t_start, dur, kind, live, pending,
    prefilling) per step; serve-bench --trace renders it."""
    eng = make_engine(params, decode_chunk=2)
    eng.trace = []
    eng.run([Request(prompt=list(rng.integers(0, CFG.vocab_size, 12)),
                     max_new_tokens=4)])
    assert eng.trace, "no steps traced"
    kinds = {t[2] for t in eng.trace}
    assert "decode" in kinds
    for t in eng.trace:
        assert len(t) == 6 and t[1] >= 0.0
