"""Token sampling for the decode loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(logits, key, *, temperature: float = 0.0, top_k: int = 0,
           top_p: float = 0.0):
    """logits [B, vocab] -> token ids [B]. temperature 0 = greedy;
    top_k keeps the k best, top_p (nucleus) keeps the smallest set
    whose probability mass reaches p (both applied when both set)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        vals, _ = jax.lax.top_k(logits, top_k)
        cutoff = vals[..., -1:]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def apply_top_p(logits, top_p):
    """Nucleus filter: keep the smallest descending-sorted set whose
    cumulative mass reaches p (the argmax always survives). `top_p` is
    a scalar or a per-row [B] array; rows with p <= 0 or p >= 1 pass
    through unfiltered."""
    p = jnp.asarray(top_p, jnp.float32)
    if p.ndim == 1:
        p = p[:, None]
    active = (p > 0.0) & (p < 1.0)
    p_eff = jnp.where(active, p, 1.0)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep = (csum - probs) < p_eff                        # [B, V] sorted
    thr = jnp.min(
        jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(active & (logits < thr), -jnp.inf, logits)


def generate(params, prompt_tokens, cfg, *, max_new_tokens: int,
             max_len: int | None = None, temperature: float = 0.0,
             top_k: int = 0, top_p: float = 0.0, key=None):
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
    tok = sample(logits, keys[0], temperature=temperature, top_k=top_k,
                 top_p=top_p)

    def step(carry, k_step):
        tok, cache, lengths = carry
        logits, cache, lengths = decode_step(params, tok, cfg, cache,
                                             lengths)
        nxt = sample(logits, k_step, temperature=temperature,
                     top_k=top_k, top_p=top_p)
        return (nxt, cache, lengths), tok

    (last, _, _), toks = jax.lax.scan(
        step, (tok, cache, lengths), keys[1:])
    return jnp.concatenate([toks.T, last[:, None]], axis=1)
