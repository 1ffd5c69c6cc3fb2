"""Sliding-window plumbing below the engine: per-folded-query window
starts in the paged kernel (speculative decode under a window), raw
negative starts, allocator front-pop eviction, and base-aware cache
state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.paged import (
    paged_decode_reference,
    paged_flash_decode,
)
from flash_attention_tpu.runtime.kv_cache import LayeredPagedKVCache

PAGE = 128


def _pools(rng, hkv, pages, d, dtype=jnp.float32):
    k = jnp.asarray(rng.normal(0, 0.02, (hkv, pages, PAGE, d)), dtype)
    v = jnp.asarray(rng.normal(0, 0.02, (hkv, pages, PAGE, d)), dtype)
    return k, v


def test_qpos_spread_per_query_window_starts(rng):
    """T folded query positions: query t's window start is starts + t,
    exactly — verified against T separate single-position calls."""
    b, hkv, group, t_new, d = 2, 2, 2, 4, 64
    kp, vp = _pools(rng, hkv, 8, d)
    tbl = jnp.asarray(np.arange(b * 3).reshape(b, 3), jnp.int32)
    lens = jnp.asarray([300, 215], jnp.int32)
    starts = jnp.asarray([110, 40], jnp.int32)
    q = jnp.asarray(
        rng.normal(0, 0.02, (b, hkv, group, t_new, d)), jnp.float32)

    got = paged_flash_decode(
        q.reshape(b, hkv * group * t_new, d), kp, vp, tbl, lens,
        window_starts=starts, qpos_spread=t_new,
    ).reshape(b, hkv, group, t_new, d)

    for t in range(t_new):
        want = paged_flash_decode(
            q[:, :, :, t].reshape(b, hkv * group, d), kp, vp, tbl, lens,
            window_starts=starts + t,
        ).reshape(b, hkv, group, d)
        np.testing.assert_allclose(
            np.asarray(got[:, :, :, t]), np.asarray(want),
            rtol=1e-5, atol=1e-6, err_msg=f"folded position {t}")


def test_negative_window_starts_equal_unwindowed(rng):
    """Raw starts below 0 (window not yet full) mask nothing."""
    b, hq, d = 2, 4, 64
    kp, vp = _pools(rng, 2, 6, d)
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    lens = jnp.asarray([200, 130], jnp.int32)
    q = jnp.asarray(rng.normal(0, 0.02, (b, hq, d)), jnp.float32)
    base = paged_flash_decode(q, kp, vp, tbl, lens)
    got = paged_flash_decode(
        q, kp, vp, tbl, lens,
        window_starts=jnp.asarray([-50, -1], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-6, atol=1e-7)


def test_windowed_reference_agrees(rng):
    """Kernel vs the gather-based reference with per-seq starts."""
    b, hq, d = 2, 4, 64
    kp, vp = _pools(rng, 2, 6, d)
    tbl = jnp.asarray(np.arange(b * 2).reshape(b, 2), jnp.int32)
    lens = jnp.asarray([250, 130], jnp.int32)
    starts = jnp.asarray([90, 10], jnp.int32)
    q = jnp.asarray(rng.normal(0, 0.02, (b, hq, d)), jnp.float32)
    got = paged_flash_decode(q, kp, vp, tbl, lens, window_starts=starts)
    want = paged_decode_reference(q, kp, vp, tbl, lens,
                                  window_starts=starts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_cache_evict_below_and_base_state(rng):
    """Front-pop eviction frees pages for reuse; batch_state shifts to
    stored coordinates; attention over the stored window matches the
    dense truth."""
    L, HKV, D, T = 1, 2, 64, 3 * PAGE + 40
    cache = LayeredPagedKVCache(
        n_layers=L, kv_heads=HKV, head_dim=D, num_pages=8,
        page_size=PAGE, max_seqs=2, tail_size=16, dtype=jnp.float32)
    tk = rng.normal(0, 0.02, (L, HKV, T, D)).astype(np.float32)
    tv = rng.normal(0, 0.02, (L, HKV, T, D)).astype(np.float32)
    sid = cache.add_sequence(jnp.asarray(tk), jnp.asarray(tv))
    free_before = cache.free_pages

    # Keep positions >= 300 -> base page = 2 (256 tokens evicted).
    freed = cache.evict_below(sid, 300)
    assert freed == 2
    assert cache.free_pages == free_before + 2
    assert cache.base_tokens(sid) == 2 * PAGE
    assert cache.length(sid) == T          # absolute length unchanged

    tables, lens = cache.batch_state([sid], 4)
    assert int(lens[0]) == T - 2 * PAGE    # stored tokens
    assert int(cache.bases([sid])[0]) == 2 * PAGE

    # Attention over the stored region must equal dense attention over
    # positions [256, T) of the truth.
    q = jnp.asarray(rng.normal(0, 0.02, (1, HKV * 2, D)), jnp.float32)
    got = paged_flash_decode(
        q, cache.k_pools[0], cache.v_pools[0], tables, lens)
    from flash_attention_tpu.ops.decode import decode_reference
    ref = decode_reference(
        q, jnp.asarray(tk[0, None, :, 2 * PAGE:]),
        jnp.asarray(tv[0, None, :, 2 * PAGE:]), lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # Freed pages are reusable: a second sequence takes them.
    sid2 = cache.add_sequence(
        jnp.asarray(tk[:, :, :2 * PAGE]), jnp.asarray(tv[:, :, :2 * PAGE]))
    assert sid2 >= 0

    # Flush into the evicted sequence's tail region still lands right.
    for li in range(L):
        cache.k_tails[li] = cache.k_tails[li].at[0, :, :8, :].set(0.5)
        cache.v_tails[li] = cache.v_tails[li].at[0, :, :8, :].set(0.5)
    cache.flush_tails([sid, -1], [8, 0])
    assert cache.length(sid) == T + 8
    tables2, lens2 = cache.batch_state([sid], 4)
    assert int(lens2[0]) == T + 8 - 2 * PAGE


def test_cache_write_below_base_rejected(rng):
    cache = LayeredPagedKVCache(
        n_layers=1, kv_heads=2, head_dim=64, num_pages=8,
        page_size=PAGE, max_seqs=2, tail_size=16, dtype=jnp.float32)
    tk = jnp.asarray(rng.normal(0, 0.02, (1, 2, 2 * PAGE, 64)),
                     jnp.float32)
    sid = cache.add_sequence(tk, tk)
    cache.evict_below(sid, PAGE)
    with pytest.raises(ValueError):
        cache.write(sid, 0, tk[:, :, :PAGE], tk[:, :, :PAGE])
