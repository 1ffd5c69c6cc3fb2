"""Paged attention kernel + allocator + cache manager."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.paged import (
    paged_decode_reference,
    paged_flash_decode,
)
from flash_attention_tpu.runtime.allocator import PyAllocator, make_allocator
from flash_attention_tpu.runtime.kv_cache import PagedKVCache
from flash_attention_tpu.utils.metrics import verify


def test_allocator_contract_native_and_python():
    for a in (make_allocator(16, 128, 4), PyAllocator(16, 128, 4)):
        s0 = a.alloc(300)       # 3 pages
        assert a.free_pages == 13
        assert a.extend(s0, 400)  # 4 pages
        table, n = a.page_table(s0, 8)
        assert n == 4 and len(set(table[:4])) == 4
        f = a.fork(s0)
        assert a.free_pages == 12  # shared, no new pages
        page, copied = a.cow_last_page(f)
        assert copied == table[3] and page != table[3]
        a.free(s0)
        a.free(f)
        assert a.free_pages == 16


def test_allocator_oom_paths():
    a = PyAllocator(2, 128, 2)
    s = a.alloc(256)
    assert s >= 0 and a.alloc(1) == -1        # no pages left
    assert not a.extend(s, 300)               # would need a 3rd page
    a.free(s)
    assert a.alloc(1) >= 0


def _random_paged_setup(rng, batch, hq, hkv, d, page_size, lengths_list,
                        num_pages=64, dtype=jnp.float32):
    max_pages = max(-(-l // page_size) for l in lengths_list)
    k_pool = jnp.asarray(
        rng.normal(0, 0.02, (hkv, num_pages, page_size, d)), dtype)
    v_pool = jnp.asarray(
        rng.normal(0, 0.02, (hkv, num_pages, page_size, d)), dtype)
    # Random non-overlapping page assignment.
    perm = rng.permutation(num_pages)
    tables, idx = [], 0
    for l in lengths_list:
        n = -(-l // page_size)
        row = np.zeros(max_pages, np.int32)
        row[:n] = perm[idx: idx + n]
        idx += n
        tables.append(row)
    q = jnp.asarray(rng.normal(0, 0.02, (batch, hq, d)), dtype)
    return (q, k_pool, v_pool, jnp.asarray(np.stack(tables)),
            jnp.asarray(lengths_list, jnp.int32))


def test_paged_decode_matches_reference(rng):
    q, kp, vp, table, lengths = _random_paged_setup(
        rng, 3, 4, 2, 64, 128, [256, 100, 384])
    out = paged_flash_decode(q, kp, vp, table, lengths)
    ref = paged_decode_reference(q, kp, vp, table, lengths)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_paged_decode_single_page_and_empty_tail(rng):
    q, kp, vp, table, lengths = _random_paged_setup(
        rng, 2, 2, 1, 128, 256, [256, 1])
    out = paged_flash_decode(q, kp, vp, table, lengths)
    ref = paged_decode_reference(q, kp, vp, table, lengths)
    assert verify(out, ref).passed


def test_paged_cache_end_to_end(rng):
    """Admit sequences, append decode tokens, attention matches the
    contiguous-cache reference at every step."""
    from flash_attention_tpu.ops.decode import decode_reference

    hkv, d = 2, 64
    cache = PagedKVCache(kv_heads=hkv, head_dim=d, num_pages=32,
                         page_size=128, max_seqs=4, dtype=jnp.float32)
    lens = [200, 57]
    prefixes = []
    sids = []
    for l in lens:
        k = jnp.asarray(rng.normal(0, 0.02, (hkv, l, d)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 0.02, (hkv, l, d)), jnp.float32)
        sids.append(cache.add_sequence(k, v))
        prefixes.append((k, v))

    for step in range(3):
        q = jnp.asarray(
            rng.normal(0, 0.02, (len(sids), 4, d)), jnp.float32)
        out = cache.decode(q, sids)
        # Build contiguous reference from tracked prefixes.
        maxlen = max(p[0].shape[1] for p in prefixes)
        kc = jnp.stack([
            jnp.pad(p[0], ((0, 0), (0, maxlen - p[0].shape[1]), (0, 0)))
            for p in prefixes])
        vc = jnp.stack([
            jnp.pad(p[1], ((0, 0), (0, maxlen - p[1].shape[1]), (0, 0)))
            for p in prefixes])
        ref = decode_reference(
            q, kc, vc,
            jnp.asarray([p[0].shape[1] for p in prefixes], jnp.int32))
        report = verify(out, ref)
        assert report.passed, f"step {step}: {report}"
        # Append a new token per sequence.
        for i, sid in enumerate(sids):
            kn = jnp.asarray(rng.normal(0, 0.02, (hkv, d)), jnp.float32)
            vn = jnp.asarray(rng.normal(0, 0.02, (hkv, d)), jnp.float32)
            cache.append_token(sid, kn, vn)
            prefixes[i] = (
                jnp.concatenate([prefixes[i][0], kn[:, None]], axis=1),
                jnp.concatenate([prefixes[i][1], vn[:, None]], axis=1),
            )

    cache.free_sequence(sids[0])
    assert cache.allocator.free_pages > 0


def test_paged_quantized_decode(rng):
    q, kp, vp, table, lengths = _random_paged_setup(
        rng, 2, 8, 2, 128, 256, [512, 300], dtype=jnp.bfloat16)
    # Quantize pools page-wise (as PagedKVCache.quantize does).
    cache = PagedKVCache(kv_heads=2, head_dim=128, num_pages=64,
                         page_size=256, max_seqs=4)
    cache.k_pool, cache.v_pool = kp, vp
    cache.quantize()
    out = paged_flash_decode(
        q, cache.k_pool, cache.v_pool, table, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales)
    ref = paged_decode_reference(
        q, cache.k_pool, cache.v_pool, table, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_paged_cache_oom(rng):
    cache = PagedKVCache(kv_heads=1, head_dim=64, num_pages=2,
                         page_size=128, max_seqs=2, dtype=jnp.float32)
    k = jnp.zeros((1, 256, 64), jnp.float32)
    cache.add_sequence(k, k)
    with pytest.raises(MemoryError):
        cache.add_sequence(k[:, :1], k[:, :1])


def test_paged_decode_tp_sharded_heads(rng):
    """Tensor-parallel serving: KV pools and query heads sharded over a
    tp mesh axis via shard_map, page tables/lengths replicated — each
    shard decodes its local head group independently (the multi-host
    decode layout of BASELINE.json config 5; the wo-projection psum
    happens at the model layer)."""
    import functools
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from flash_attention_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=-1, tp=4)
    B, HQ, HKV, D, PS = 2, 8, 4, 64, 128
    q, k_pool, v_pool, tables, lengths = _random_paged_setup(
        rng, B, HQ, HKV, D, PS, [300, 129], num_pages=16)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, "tp", None), P("tp", None, None, None),
                  P("tp", None, None, None), P(None, None), P(None)),
        out_specs=P(None, "tp", None), check_vma=False)
    def sharded_decode(q, kp, vp, t, l):
        return paged_flash_decode(q, kp, vp, t, l)

    q_sh = jax.device_put(q, NamedSharding(mesh, P(None, "tp", None)))
    kp_sh = jax.device_put(
        k_pool, NamedSharding(mesh, P("tp", None, None, None)))
    vp_sh = jax.device_put(
        v_pool, NamedSharding(mesh, P("tp", None, None, None)))
    out = sharded_decode(q_sh, kp_sh, vp_sh, tables, lengths)
    ref = paged_decode_reference(q, k_pool, v_pool, tables, lengths)
    assert verify(out, ref).passed
    assert out.sharding.spec[1] == "tp"


def test_validate_paged_inputs_checkify(rng):
    """The checkify guard (sanitizer analog, SURVEY.md §5) flags
    out-of-range page ids and over-capacity lengths, under jit."""
    import jax
    from jax.experimental import checkify
    from flash_attention_tpu.ops.paged import validate_paged_inputs

    hkv, pages, ps, d = 2, 8, 128, 64
    kp = jnp.zeros((hkv, pages, ps, d), jnp.float32)

    @jax.jit
    def run(tbl, lens):
        err, _ = checkify.checkify(
            validate_paged_inputs, errors=checkify.user_checks)(
            kp, tbl, lens)
        return err

    good_tbl = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    good_len = jnp.asarray([100, 256], jnp.int32)
    run(good_tbl, good_len).throw()          # no error

    bad_tbl = jnp.asarray([[0, 99], [2, 3]], jnp.int32)
    with pytest.raises(Exception, match="out-of-range page ids"):
        run(bad_tbl, good_len).throw()

    bad_len = jnp.asarray([100, 2 * ps + 1], jnp.int32)
    with pytest.raises(Exception, match="exceed page-table capacity"):
        run(good_tbl, bad_len).throw()


def test_paged_window_matches_reference(rng):
    """Sliding-window paged decode: only the last `window` positions
    visible; below-window pages skip (and their DMA redirects)."""
    q, kp, vp, table, lengths = _random_paged_setup(
        rng, 3, 4, 2, 64, 128, [700, 260, 64], num_pages=64)
    for w in (256, 100, 1000):
        out = paged_flash_decode(q, kp, vp, table, lengths, window=w)
        ref = paged_decode_reference(q, kp, vp, table, lengths, window=w)
        assert verify(out, ref).passed, f"window={w}"
    # Window larger than every length == full attention.
    full = paged_flash_decode(q, kp, vp, table, lengths)
    win = paged_flash_decode(q, kp, vp, table, lengths, window=4096)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                               atol=1e-6)


def test_paged_window_quantized(rng):
    from flash_attention_tpu.ops.quant import QUANT_BLOCK

    hkv, d, ps = 2, 64, 128
    q, kp, vp, table, lengths = _random_paged_setup(
        rng, 2, 4, hkv, d, ps, [512, 300], num_pages=32)
    qmax = 127.0
    def quant(pool):
        xf = pool.astype(jnp.float32).reshape(
            hkv, 32, ps // QUANT_BLOCK, QUANT_BLOCK, d)
        absmax = jnp.max(jnp.abs(xf), axis=3, keepdims=True)
        sc = jnp.maximum(absmax / qmax, 1e-8)
        qv = jnp.clip(jnp.round(xf / sc), -qmax, qmax)
        return (qv.astype(jnp.int8).reshape(hkv, 32, ps, d),
                sc[..., 0, :])
    kq, ks = quant(kp)
    vq, vs = quant(vp)
    out = paged_flash_decode(q, kq, vq, table, lengths,
                             k_scales=ks, v_scales=vs, window=200)
    ref = paged_decode_reference(q, kq, vq, table, lengths,
                                 k_scales=ks, v_scales=vs, window=200)
    assert verify(out, ref).passed


def test_fold_scales_matches_standard_int8(rng):
    """int8 fold_scales fast path == default dequant path within bf16
    rounding (association differs; values don't). fp8 pools reject."""
    from flash_attention_tpu.ops.quant import QUANT_BLOCK

    hkv, pages, ps, d, b, hq = 4, 6, 256, 64, 3, 8
    kf = rng.normal(0, 0.02, (hkv, pages, ps, d)).astype(np.float32)
    vf = rng.normal(0, 0.02, (hkv, pages, ps, d)).astype(np.float32)

    def quant(x):
        xr = x.reshape(hkv, pages, ps // QUANT_BLOCK, QUANT_BLOCK, d)
        sc = np.maximum(np.abs(xr).max(axis=3, keepdims=True) / 127.0,
                        1e-8)
        q = np.clip(np.round(xr / sc), -127, 127).astype(np.int8)
        return (jnp.asarray(q.reshape(hkv, pages, ps, d)),
                jnp.asarray(sc[..., 0, :], jnp.float32))

    kq, ksc = quant(kf)
    vq, vsc = quant(vf)
    q = jnp.asarray(rng.normal(0, 0.02, (b, hq, d)), jnp.bfloat16)
    tbl = jnp.asarray(
        rng.permutation(pages)[:b * 2].reshape(b, 2), jnp.int32)
    lens = jnp.asarray([300, 130, 512], jnp.int32)

    o_std = paged_flash_decode(q, kq, vq, tbl, lens,
                               k_scales=ksc, v_scales=vsc)
    o_fold = paged_flash_decode(q, kq, vq, tbl, lens,
                                k_scales=ksc, v_scales=vsc,
                                fold_scales=True)
    np.testing.assert_allclose(
        np.asarray(o_std, np.float32), np.asarray(o_fold, np.float32),
        atol=5e-5)
    with pytest.raises(ValueError, match="int8 fast path"):
        paged_flash_decode(q, jnp.asarray(kf), vq, tbl, lens,
                           k_scales=ksc, v_scales=vsc, fold_scales=True)
