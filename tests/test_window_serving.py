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
    with pytest.raises(NotImplementedError):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=128,
               prefill_chunk=32)
    with pytest.raises(NotImplementedError):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=128,
               speculative_k=2)
    with pytest.raises(ValueError):
        Engine(params, CFG, max_batch=2, num_pages=16, page_size=128,
               tail_size=128)   # window 96 <= tail
