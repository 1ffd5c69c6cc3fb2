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


def speculative_sample(logits, tokens, temps, top_ps, key):
    """Rejection-scheme speculative sampling over one multi-token
    verify dispatch (Leviathan/Chen speculative sampling specialized to
    a DETERMINISTIC draft, i.e. a point-mass proposal q = onehot(d)):

      * position i's target distribution p_i = softmax of the (temp +
        nucleus)-filtered logits; the draft token d_{i+1} is accepted
        with probability p_i(d_{i+1}) (min(1, p/q) with q = 1);
      * at the first rejection a, the correction token samples from the
        residual max(p_a - q_a, 0)/Z — for a point mass that is exactly
        p_a with the draft token masked out and renormalized;
      * if every draft is accepted, a bonus token samples from p_k.

    The output distribution provably equals sequential sampling from p,
    so speculation never changes the sampling law — only the number of
    weight reads per token. Greedy rows (temp <= 0) use the argmax-
    equality limit (identical to the old greedy-only verify).

    Args:
      logits: [B, k+1, V] verify logits (position i predicts the token
        after input position i).
      tokens: [B, k+1] int32 — the dispatched block: [next_token,
        k draft tokens].
      temps, top_ps: [B] f32 per-row sampling knobs.
      key: PRNG key for this step.

    Returns (out [B, k+1] int32, accepted [B] int32): row b's emitted
    tokens are out[b, :accepted[b] + 1].
    """
    b, kp1, v = logits.shape
    k = kp1 - 1
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B, k+1]
    drafts = (tokens[:, 1:] if k
              else jnp.zeros((b, 0), jnp.int32))             # [B, k]
    pos = jnp.arange(kp1)[None, :]
    dpad = jnp.pad(drafts, ((0, 0), (0, 1)))

    def emit(accepted, corr):
        # out[:, i] = draft for i < accepted, correction at i == accepted.
        out = jnp.where(pos < accepted[:, None], dpad,
                        jnp.where(pos == accepted[:, None],
                                  corr[:, None], dpad))
        return out.astype(jnp.int32), accepted.astype(jnp.int32)

    def greedy_path(_):
        # Argmax-equality limit: no filtered distributions needed.
        if k:
            acc = (greedy[:, :k] == drafts).astype(jnp.int32)
            accepted = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)
        else:
            accepted = jnp.zeros((b,), jnp.int32)
        corr = jnp.take_along_axis(
            greedy, accepted[:, None], axis=1)[:, 0]
        return emit(accepted, corr)

    def sampled_path(_):
        tsafe = jnp.maximum(temps, 1e-6)[:, None, None]
        filt = apply_top_p(
            (logits / tsafe).reshape(b * kp1, v),
            jnp.repeat(top_ps, kp1),
        ).reshape(b, kp1, v)
        p = jax.nn.softmax(filt, axis=-1)                    # [B, k+1, V]

        is_greedy = (temps <= 0.0)[:, None]
        k2 = key
        if k:
            p_draft = jnp.take_along_axis(
                p[:, :k], drafts[..., None], axis=-1)[..., 0]  # [B, k]
            k2, ku = jax.random.split(k2)
            u = jax.random.uniform(ku, (b, k))
            acc = jnp.where(is_greedy, greedy[:, :k] == drafts,
                            u < p_draft)
            # First rejected index in 0..k (k = all accepted).
            accepted = jnp.sum(
                jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        else:
            accepted = jnp.zeros((b,), jnp.int32)

        # Correction token at position `accepted`: residual distribution
        # (draft token masked) on a true rejection, plain p_k on
        # accept-all.
        filt_a = jnp.take_along_axis(
            filt, accepted[:, None, None], axis=1)[:, 0]     # [B, V]
        if k:
            d_a = jnp.take_along_axis(
                tokens, jnp.minimum(accepted + 1, k)[:, None],
                axis=1)[:, 0]
            rejected = (accepted < k)[:, None]
            onehot = jax.nn.one_hot(d_a, v, dtype=jnp.bool_)
            filt_a = jnp.where(rejected & onehot, -jnp.inf, filt_a)
        k2, kc = jax.random.split(k2)
        corr_s = jax.random.categorical(
            kc, filt_a, axis=-1).astype(jnp.int32)
        corr_g = jnp.take_along_axis(
            greedy, accepted[:, None], axis=1)[:, 0]
        corr = jnp.where(is_greedy[:, 0], corr_g, corr_s)    # [B]
        return emit(accepted, corr)

    # All-greedy batches skip the sampled branch entirely: its nucleus
    # filter sorts [B*(k+1), vocab] per verify dispatch, which at 128K
    # vocab costs more than the verify forward itself.
    return jax.lax.cond(
        jnp.all(temps <= 0.0), greedy_path, sampled_path, operand=None)


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
