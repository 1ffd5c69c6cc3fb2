"""Speculative decoding: multi-token decode-step parity vs sequential
single-token steps, draft proposal, and engine transcript equivalence
(speculation must never change greedy output)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step_paged,
    decode_step_paged_multi,
    init_params,
    prefill_kv,
)
from flash_attention_tpu.runtime.kv_cache import LayeredPagedKVCache

CFG = LlamaConfig.tiny(dtype=jnp.float32)
PAGE = 128


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def _setup_cache(params, prompts):
    """Prefill prompts into a paged cache; returns (cache, sids,
    last_logits)."""
    cache = LayeredPagedKVCache(
        n_layers=CFG.n_layers, kv_heads=CFG.n_kv_heads,
        head_dim=CFG.head_dim, num_pages=16, page_size=PAGE,
        max_seqs=len(prompts), tail_size=16)
    sids = []
    logits_list = []
    for p in prompts:
        toks = jnp.asarray([p], jnp.int32)
        logits, ks, vs = prefill_kv(params, toks, CFG)
        sids.append(cache.add_sequence(ks[:, 0], vs[:, 0]))
        logits_list.append(logits[0])
    return cache, sids, logits_list


def test_multi_step_matches_sequential(params, rng):
    """One T=4 dispatch must produce the same logits as 4 sequential
    single-token steps feeding the same tokens."""
    prompts = [list(rng.integers(0, CFG.vocab_size, n)) for n in (9, 23)]
    feed = np.asarray(
        rng.integers(0, CFG.vocab_size, (2, 4)), np.int32)

    cache, sids, _ = _setup_cache(params, prompts)
    tables, lens = cache.batch_state(sids, 2)
    tail_pos = jnp.zeros(2, jnp.int32)
    seq_logits = []
    kt, vt = cache.k_tails, cache.v_tails
    for i in range(4):
        lg, kt, vt = decode_step_paged(
            params, jnp.asarray(feed[:, i]), CFG,
            cache.k_pools, cache.v_pools, kt, vt,
            tables, lens, tail_pos + i)
        seq_logits.append(lg)

    cache2, sids2, _ = _setup_cache(params, prompts)
    tables2, lens2 = cache2.batch_state(sids2, 2)
    multi_logits, _, _ = decode_step_paged_multi(
        params, jnp.asarray(feed), CFG,
        cache2.k_pools, cache2.v_pools, cache2.k_tails, cache2.v_tails,
        tables2, lens2, jnp.zeros(2, jnp.int32))

    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(multi_logits[:, i]), np.asarray(seq_logits[i]),
            rtol=2e-4, atol=2e-5, err_msg=f"position {i}")


def test_ngram_draft_proposal():
    from flash_attention_tpu.runtime.engine import propose_ngram_draft

    hist = np.asarray([5, 6, 7, 8, 9, 5, 6], np.int32)
    # Last bigram (5, 6) matched earlier -> continuation 7, 8, 9.
    assert list(propose_ngram_draft(hist, 3)) == [7, 8, 9]
    # Continuation shorter than k: padded with the last token.
    assert list(propose_ngram_draft(
        np.asarray([1, 2, 9, 1, 2], np.int32), 4)) == [9, 1, 2, 2]
    # No match -> repeat last token (harmless low-acceptance draft).
    assert list(propose_ngram_draft(
        np.asarray([1, 2, 3, 4], np.int32), 2)) == [4, 4]
    # History shorter than the bigram.
    assert list(propose_ngram_draft(
        np.asarray([3], np.int32), 2)) == [3, 3]


@pytest.mark.slow
def test_engine_speculative_matches_plain_greedy(params, rng):
    """Speculation is exactness-preserving: transcripts equal the plain
    engine on random prompts (low acceptance) AND on repetitive prompts
    (high acceptance), where acceptance must actually engage."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    def serve(prompts, n_new, **kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=PAGE, tail_size=16, **kw)
        reqs = [Request(prompt=list(p), max_new_tokens=n_new)
                for p in prompts]
        by_id = {c.request_id: c for c in eng.run(reqs)}
        return [by_id[r.request_id].tokens for r in reqs], eng.stats

    rand = [list(rng.integers(0, CFG.vocab_size, 21)),
            list(rng.integers(0, CFG.vocab_size, 45))]
    base, _ = serve(rand, 8)
    got, stats = serve(rand, 8, speculative_k=3)
    assert got == base
    assert stats.spec_proposed > 0

    rep = [list(np.tile([3, 1, 4, 1, 5], 8))]     # highly repetitive
    base_r, _ = serve(rep, 10)
    got_r, stats_r = serve(rep, 10, speculative_k=3)
    assert got_r == base_r
    assert stats_r.spec_accepted > 0, "repetitive prompt must accept"


def test_speculative_sample_preserves_distribution(rng):
    """Monte Carlo: the rejection scheme's FIRST emitted token must be
    distributed exactly like direct sampling from the (temp + top-p)
    target — for drafts the model likes (high acceptance) and drafts it
    doesn't (mostly rejected), including the nucleus filter."""
    from flash_attention_tpu.models.sampling import (
        apply_top_p, speculative_sample,
    )

    v, k, trials = 12, 3, 4000
    logits = jnp.asarray(rng.normal(0, 1.5, (1, k + 1, v)), jnp.float32)
    temps = jnp.asarray([0.8], jnp.float32)
    top_ps = jnp.asarray([0.9], jnp.float32)

    target = jax.nn.softmax(
        apply_top_p(logits[:, 0] / temps[0], top_ps), axis=-1)[0]
    run = jax.jit(lambda key, toks: speculative_sample(
        logits, toks, temps, top_ps, key))

    for draft_tok in (int(jnp.argmax(logits[0, 0])),   # liked draft
                      int(jnp.argmin(logits[0, 0]))):  # disliked draft
        toks = jnp.asarray([[0] + [draft_tok] * k], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(7), trials)
        outs = jax.vmap(lambda kk: run(kk, toks)[0][0, 0])(keys)
        counts = np.bincount(np.asarray(outs), minlength=v)
        emp = counts / trials
        tv = 0.5 * float(np.abs(emp - np.asarray(target)).sum())
        assert tv < 0.05, (draft_tok, tv, emp, np.asarray(target))


def test_speculative_sample_greedy_limit(rng):
    """temps<=0 rows reproduce the argmax-equality acceptance exactly."""
    from flash_attention_tpu.models.sampling import speculative_sample

    v, k = 9, 3
    logits = jnp.asarray(rng.normal(0, 1.0, (2, k + 1, v)), jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    # Row 0: drafts follow greedy for 2 positions then diverge;
    # row 1: first draft already wrong.
    toks = np.zeros((2, k + 1), np.int32)
    toks[0, 1] = greedy[0, 0]
    toks[0, 2] = greedy[0, 1]
    toks[0, 3] = (greedy[0, 2] + 1) % v
    toks[1, 1] = (greedy[1, 0] + 1) % v
    out, acc = speculative_sample(
        logits, jnp.asarray(toks), jnp.zeros(2), jnp.zeros(2),
        jax.random.PRNGKey(0))
    out, acc = np.asarray(out), np.asarray(acc)
    assert acc[0] == 2 and acc[1] == 0
    assert list(out[0, :3]) == [greedy[0, 0], greedy[0, 1], greedy[0, 2]]
    assert out[1, 0] == greedy[1, 0]


@pytest.mark.slow
def test_engine_speculative_sampled_requests(params, rng):
    """temperature>0 requests now speculate (rejection sampling):
    correct lengths, valid tokens, and drafts actually proposed."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    eng = Engine(params, CFG, max_batch=2, num_pages=32, page_size=PAGE,
                 tail_size=16, speculative_k=3)
    reqs = [Request(prompt=list(np.tile([3, 1, 4, 1, 5], 6)),
                    max_new_tokens=8, temperature=0.7, top_p=0.9),
            Request(prompt=list(rng.integers(0, CFG.vocab_size, 17)),
                    max_new_tokens=8)]
    out = {c.request_id: c for c in eng.run(reqs)}
    for r in reqs:
        toks = out[r.request_id].tokens
        assert len(toks) == 8
        assert all(0 <= t < CFG.vocab_size for t in toks)
    assert eng.stats.spec_proposed > 0


@pytest.mark.slow
def test_speculative_composes_with_prefix_cache_and_quant(params, rng):
    """Spec decode + automatic prefix caching + int8 KV pools in one
    engine: transcripts equal the plain engine with the same pools."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    prompt = list(rng.integers(0, CFG.vocab_size, 2 * PAGE + 15))

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=PAGE, tail_size=16,
                     kv_quant_dtype=jnp.int8, **kw)
        outs = []
        for _ in range(2):   # second run hits the prefix cache
            outs.append(eng.run(
                [Request(prompt=list(prompt), max_new_tokens=6)]
            )[0].tokens)
        return outs, eng.stats

    base, _ = serve()
    got, stats = serve(speculative_k=3, prefix_cache=True)
    assert got == base
    assert stats.prefix_cached_tokens == 2 * PAGE
    assert stats.spec_proposed > 0


@pytest.mark.slow
def test_speculative_composes_with_moe(rng):
    """Spec decode on an MoE model (params-dispatched FFN): transcript
    parity with the plain MoE engine."""
    from flash_attention_tpu.models.moe import MoEConfig, init_moe_params
    from flash_attention_tpu.runtime.engine import Engine, Request

    cfg = MoEConfig.tiny_moe(dtype=jnp.float32)
    cfg = MoEConfig(**{**cfg.__dict__, "capacity_factor": 8.0})
    params = init_moe_params(cfg, jax.random.PRNGKey(1))
    prompt = list(rng.integers(0, cfg.vocab_size, 19))

    def serve(**kw):
        eng = Engine(params, cfg, max_batch=2, num_pages=16,
                     page_size=PAGE, tail_size=16, **kw)
        return eng.run(
            [Request(prompt=list(prompt), max_new_tokens=6)])[0].tokens

    assert serve(speculative_k=3) == serve()


def test_engine_model_draft_self_accepts(params, rng):
    """Model-based drafting with draft == target (self-draft): the
    draft's contiguous-cache greedy path must agree with the paged
    verify path almost always, so acceptance must be high — any
    off-by-one in the draft cache position bookkeeping (install length,
    the +a+1 advance, the (k+1)-th ingest step) collapses acceptance
    to ~0 and fails this. Transcripts must equal the plain engine."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    prompts = [list(rng.integers(0, CFG.vocab_size, 17)),
               list(rng.integers(0, CFG.vocab_size, 31))]

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=PAGE, tail_size=16, **kw)
        reqs = [Request(prompt=list(p), max_new_tokens=10)
                for p in prompts]
        by_id = {c.request_id: c for c in eng.run(reqs)}
        return [by_id[r.request_id].tokens for r in reqs], eng.stats

    base, _ = serve()
    got, stats = serve(speculative_k=3, draft_params=params,
                       draft_cfg=CFG)
    assert got == base
    assert stats.spec_proposed > 0
    rate = stats.spec_accepted / stats.spec_proposed
    assert rate >= 0.9, (stats.spec_accepted, stats.spec_proposed)


def test_engine_speculative_rounds_stack(params, rng):
    """speculative_rounds > 1 fuses R draft+verify rounds in one
    dispatch (the round-4 composition residue: spec x chunking now
    stack). Transcripts equal the plain engine; with a self-draft the
    engine must emit ~R*(k+1) tokens per engine step."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    prompts = [list(rng.integers(0, CFG.vocab_size, 13)),
               list(rng.integers(0, CFG.vocab_size, 29))]

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=PAGE, tail_size=32, **kw)
        reqs = [Request(prompt=list(p), max_new_tokens=12)
                for p in prompts]
        by_id = {c.request_id: c for c in eng.run(reqs)}
        return [by_id[r.request_id].tokens for r in reqs], eng.stats

    base, _ = serve()
    got, stats = serve(speculative_k=3, speculative_rounds=3,
                       draft_params=params, draft_cfg=CFG)
    assert got == base
    # Self-draft: nearly everything accepts, so decode steps emit
    # ~R*(k+1)=12 tokens each — the whole run should take very few
    # decode dispatches (24 tokens / 12 per step + slack).
    rate = stats.spec_accepted / stats.spec_proposed
    assert rate >= 0.9, (stats.spec_accepted, stats.spec_proposed)
    decode_steps = stats.spec_proposed // (3 * 3)   # dispatches
    assert decode_steps <= 4, (decode_steps, stats)
    # Guards: rounds>1 without a draft model; tail too small.
    with pytest.raises(ValueError, match="draft model"):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=PAGE,
               tail_size=32, speculative_k=3, speculative_rounds=2)
    with pytest.raises(ValueError, match="tail_size"):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=PAGE,
               tail_size=8, speculative_k=3, speculative_rounds=2,
               draft_params=params, draft_cfg=CFG)


@pytest.mark.slow
def test_engine_model_draft_wrong_model_still_exact(params, rng):
    """A draft model with DIFFERENT random weights proposes garbage;
    acceptance ~0 but transcripts stay exact (verification is the only
    authority). Also covers the draft_max_seq cold-slot fallback and
    n>1 forks sharing the draft prompt KV."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    wrong = init_params(CFG, jax.random.PRNGKey(99))
    prompt = list(rng.integers(0, CFG.vocab_size, 25))

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=3, num_pages=32,
                     page_size=PAGE, tail_size=16, **kw)
        out = eng.run([Request(prompt=list(prompt), max_new_tokens=7,
                               n=2)])
        return [c.tokens for c in out]

    base = serve()
    assert serve(speculative_k=2, draft_params=wrong,
                 draft_cfg=CFG) == base
    # Prompt beyond the draft cache: slot stays cold, output unchanged.
    assert serve(speculative_k=2, draft_params=wrong, draft_cfg=CFG,
                 draft_max_seq=16) == base


@pytest.mark.slow
def test_engine_model_draft_tail_flush_and_long_gen(params, rng):
    """Draft path across tail flushes and enough steps that the draft
    cache advance (+a+1 per step) is exercised many times."""
    from flash_attention_tpu.runtime.engine import Engine, Request

    prompt = list(rng.integers(0, CFG.vocab_size, PAGE - 5))

    def serve(**kw):
        eng = Engine(params, CFG, max_batch=2, num_pages=32,
                     page_size=PAGE, tail_size=8, **kw)
        return eng.run([Request(prompt=list(prompt),
                                max_new_tokens=21)])[0].tokens

    assert serve(speculative_k=3, draft_params=params,
                 draft_cfg=CFG) == serve()


@pytest.mark.slow
def test_spec_oracle_cli_accepts_everything(capsys):
    """serve-bench --spec-oracle 1.0: drafts from the pre-computed
    transcript of the same requests must accept ~100% (the pre-run uses
    the same speculative verify program, so argmax picks match exactly)
    and the CLI reports the curve honestly."""
    from flash_attention_tpu.cli import main

    rc = main([
        "serve-bench", "--model", "tiny", "--batch", "4", "--requests",
        "8", "--prompt-len", "48", "--gen-len", "16", "--num-pages",
        "32", "--page-size", "128", "--spec-k", "3", "--spec-oracle",
        "1.0",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    m = re.search(r"speculative: (\d+)/(\d+) drafts accepted", out)
    assert m, out
    acc, prop = int(m.group(1)), int(m.group(2))
    assert prop > 0 and acc == prop, out  # oracle at P=1.0: all accepted
