"""Token sampling for the decode loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(logits, key, *, temperature: float = 0.0, top_k: int = 0):
    """logits [B, vocab] -> token ids [B]. temperature 0 = greedy."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        vals, _ = jax.lax.top_k(logits, top_k)
        cutoff = vals[..., -1:]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate(params, prompt_tokens, cfg, *, max_new_tokens: int,
             max_len: int | None = None, temperature: float = 0.0,
             top_k: int = 0, key=None):
    """Simple generate loop: prefill then lax.scan'd decode steps.
    prompt_tokens: [B, T]. Returns [B, max_new_tokens]."""
    from flash_attention_tpu.models.llama import (
        decode_step, init_kv_cache, prefill,
    )

    b, t = prompt_tokens.shape
    if max_len is None:
        max_len = t + max_new_tokens
    max_len = -(-max_len // 128) * 128   # lane-aligned cache length
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, max_new_tokens)
    cache = init_kv_cache(cfg, b, max_len)
    logits, cache, lengths = prefill(params, prompt_tokens, cfg, cache)
    tok = sample(logits, keys[0], temperature=temperature, top_k=top_k)

    def step(carry, k_step):
        tok, cache, lengths = carry
        logits, cache, lengths = decode_step(params, tok, cfg, cache,
                                             lengths)
        nxt = sample(logits, k_step, temperature=temperature, top_k=top_k)
        return (nxt, cache, lengths), tok

    (last, _, _), toks = jax.lax.scan(
        step, (tok, cache, lengths), keys[1:])
    return jnp.concatenate([toks.T, last[:, None]], axis=1)
