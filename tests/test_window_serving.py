"""Sliding-window models end-to-end: windowed forward/prefill/decode
consistency and the engine serving a Mistral-style config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step,
    forward,
    init_kv_cache,
    init_params,
    prefill,
)
from flash_attention_tpu.models.sampling import generate
from flash_attention_tpu.runtime.engine import Engine, Request

# Tiny windowed config: window 96 < the 128-token test sequences, so
# the window actually truncates attention; window > tail_size (16).
CFG = LlamaConfig(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=512, window=96,
                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_window_changes_logits(params, rng):
    """The window must actually bite: logits differ from full causal
    for positions deeper than the window."""
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 128)),
                       jnp.int32)
    full_cfg = LlamaConfig(**{**CFG.__dict__, "window": None})
    lw = forward(params, toks, CFG)
    lf = forward(params, toks, full_cfg)
    # Early positions (inside every window) agree; late ones diverge.
    np.testing.assert_allclose(
        np.asarray(lw[:, :64]), np.asarray(lf[:, :64]), atol=1e-4)
    assert np.abs(np.asarray(lw[:, -1]) - np.asarray(lf[:, -1])).max() \
        > 1e-3


def test_windowed_prefill_decode_matches_forward(params, rng):
    """Teacher-forced windowed decode reproduces the windowed forward
    across the window boundary (contiguous cache path)."""
    t = 128
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, t)), jnp.int32)
    full_logits = forward(params, toks, CFG)
    cache = init_kv_cache(CFG, 2, 256)
    logits_p, cache, lengths = prefill(params, toks[:, :t - 8], CFG, cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, t - 9]),
        rtol=2e-3, atol=2e-5)
    for i in range(t - 8, t):
        logits_d, cache, lengths = decode_step(
            params, toks[:, i], CFG, cache, lengths)
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(full_logits[:, i]),
            rtol=2e-3, atol=3e-5, err_msg=f"pos {i}")


@pytest.mark.slow
def test_windowed_engine_matches_generate(params, rng):
    """The paged engine (per-sequence window_starts incl. tail offset)
    reproduces the contiguous windowed generate transcript, generating
    ACROSS the window boundary."""
    prompt = list(rng.integers(0, CFG.vocab_size, 90))
    n_new = 20                               # crosses window=96
    eng = Engine(params, CFG, max_batch=2, num_pages=32, page_size=128,
                 tail_size=16, decode_chunk=4)
    got = eng.run([Request(prompt=list(prompt),
                           max_new_tokens=n_new)])[0].tokens
    want = [int(x) for x in np.asarray(generate(
        params, jnp.asarray([prompt], jnp.int32), CFG,
        max_new_tokens=n_new)[0])]
    assert got == want


def test_windowed_engine_guards(params):
    with pytest.raises(ValueError):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=128,
               tail_size=128)   # window 96 <= tail


def _serve(params, prompts, n_new, **kw):
    eng = Engine(params, CFG, max_batch=4, num_pages=32, page_size=128,
                 tail_size=16, **kw)
    reqs = [Request(prompt=list(p), max_new_tokens=n_new)
            for p in prompts]
    by_id = {c.request_id: c for c in eng.run(reqs)}
    return [by_id[r.request_id].tokens for r in reqs], eng


@pytest.mark.slow
def test_windowed_chunked_prefill_parity(params, rng):
    """Windowed CHUNKED prefill (rolling-buffer path, round-3 feature)
    must be transcript-identical to monolithic windowed prefill —
    prompts deeper than the window so the rolling mask truly bites, and
    two lengths so batched dispatch rows sit at different offsets."""
    prompts = [list(rng.integers(0, CFG.vocab_size, 150)),
               list(rng.integers(0, CFG.vocab_size, 41))]
    want, _ = _serve(params, prompts, 8)
    got, _ = _serve(params, prompts, 8, prefill_chunk=32)
    assert got == want


@pytest.mark.slow
def test_windowed_speculative_parity(params, rng):
    """Windowed + speculative (exact per-folded-query window starts in
    the paged kernel): greedy transcripts equal plain windowed decode,
    generating across the window boundary."""
    prompts = [list(rng.integers(0, CFG.vocab_size, 90)),
               list(np.tile([3, 1, 4, 1, 5], 24))]   # deep + repetitive
    want, _ = _serve(params, prompts, 12)
    got, eng = _serve(params, prompts, 12, speculative_k=3)
    assert got == want
    assert eng.stats.spec_proposed > 0


@pytest.mark.slow
def test_windowed_prefix_cache_seeds_prefill(params, rng):
    """Windowed + prefix cache: a repeated long prompt's second serve
    reuses cached pages to SEED the rolling prefill buffer (compute
    saved, counted in prefix_cached_tokens) with unchanged output."""
    prompt = list(rng.integers(0, CFG.vocab_size, 150))

    def run_twice(**kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=128, tail_size=16, **kw)
        outs = [eng.run([Request(prompt=list(prompt),
                                 max_new_tokens=6)])[0].tokens
                for _ in range(2)]
        return outs, eng.stats

    base, _ = run_twice()
    got, stats = run_twice(prefill_chunk=32, prefix_cache=True)
    assert got == base
    assert stats.prefix_cached_tokens > 0


@pytest.mark.slow
def test_windowed_eviction_bounds_page_occupancy(params, rng):
    """Below-window pages are reclaimed: a long generation holds
    O(window) pages, freed pages get reused by later requests, and the
    transcript is unaffected by eviction (vs a no-eviction round-2
    baseline there is none — parity is vs generate())."""
    prompt = list(rng.integers(0, CFG.vocab_size, 200))
    eng = Engine(params, CFG, max_batch=1, num_pages=32, page_size=128,
                 tail_size=16, prefill_chunk=32)
    free0 = eng.cache.free_pages
    got = eng.run([Request(prompt=list(prompt),
                           max_new_tokens=80)])[0].tokens
    # All pages returned after completion.
    assert eng.cache.free_pages == free0
    want = [int(x) for x in np.asarray(generate(
        params, jnp.asarray([prompt], jnp.int32), CFG,
        max_new_tokens=80)[0])]
    assert got == want

    # Mid-flight occupancy stays at the windowed peak, not O(context):
    # peak pages = ceil((window + page + tail)/page) = 2 here, vs 3+
    # for the full 280-token context.
    eng2 = Engine(params, CFG, max_batch=1, num_pages=32, page_size=128,
                  tail_size=16, prefill_chunk=32)
    eng2.submit(Request(prompt=list(prompt), max_new_tokens=80))
    peak_live = 0
    while eng2.pending or eng2.prefilling or eng2.num_active:
        eng2.step()
        for s in eng2.slots:
            if s is None:
                continue
            live = (eng2.cache.pages_for(
                max(eng2.cache.length(s.seq_id), 1))
                - eng2.cache.allocator.base(s.seq_id))
            peak_live = max(peak_live, live)
    assert peak_live <= eng2.cache.pages_for(
        CFG.window + eng2.cache.page_size + eng2.cache.tail_size), \
        peak_live


@pytest.mark.slow
def test_windowed_prefill_hbm_budget_bounds_inflight(params, rng):
    """Rolling-buffer HBM budget: with a budget of exactly one task's
    buffer bytes, admission never holds more than one windowed prefill
    task in flight at a time — yet all requests still complete, with
    transcripts identical to the unbudgeted engine."""
    prompts = [list(rng.integers(0, CFG.vocab_size, 150))
               for _ in range(3)]
    want, _ = _serve(params, prompts, 8, prefill_chunk=32)

    eng = Engine(params, CFG, max_batch=4, num_pages=32, page_size=128,
                 tail_size=16, prefill_chunk=32,
                 prefill_hbm_budget=1)   # < 2 tasks' bytes
    assert eng._wbuf_task_bytes > 1
    reqs = [Request(prompt=list(p), max_new_tokens=8) for p in prompts]
    for r in reqs:
        eng.submit(r)
    done, peak = [], 0
    for _ in range(400):
        done += eng.step()
        peak = max(peak, sum(1 for p in eng.prefilling if p.windowed))
        if len(done) == len(reqs):
            break
    assert peak <= 1
    by_id = {c.request_id: c for c in done}
    got = [by_id[r.request_id].tokens for r in reqs]
    assert got == want
