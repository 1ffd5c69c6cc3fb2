"""Paged KV-cache manager: device pools + native page allocator.

Runtime layer for serving (north-star; the reference's only state
management is `ctx.save_for_backward`, FA2-triton.py:203). The manager
owns:

  * device pools [Hkv, num_pages, page_size, D] for K and V (bf16 by
    default; `quantize()` converts a populated cache to int8/fp8 pools
    with per-page channel scales for read-mostly serving),
  * the native C++ page allocator (free-list, refcounted fork/COW),
  * host-side sequence bookkeeping (lengths, seq-id <-> batch rows).

Appends are functional jax updates (donate the pools in a jitted serving
step to make them in-place). Page-table/length tensors for the kernels
come from `batch_state()`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.ops.paged import (
    DEFAULT_PAGE_SIZE,
    paged_flash_decode,
)
from flash_attention_tpu.ops.quant import QUANT_BLOCK, _QMAX
from flash_attention_tpu.runtime.allocator import make_allocator


def page_chain_hashes(tokens, page_size: int):
    """Chain hashes identifying each FULL page of a token sequence for
    the allocator's prefix cache: hash(page_i) mixes page i's tokens
    with hash(page_{i-1}), so equal hash <=> equal token PREFIX through
    page i (not merely an equal page). uint64, 0 reserved as "none"."""
    import hashlib

    tokens = np.ascontiguousarray(np.asarray(tokens, np.int32))
    out = []
    prev = b""
    for i in range(len(tokens) // page_size):
        d = hashlib.blake2b(
            prev + tokens[i * page_size:(i + 1) * page_size].tobytes(),
            digest_size=8).digest()
        prev = d
        out.append(int.from_bytes(d, "little") or 1)
    return np.asarray(out, np.uint64)


@jax.jit
def _write_tokens(pool, page_ids, offsets, new):
    """Scatter new tokens into pool pages.

    pool: [Hkv, P, ps, D]; page_ids/offsets: [T] int32 per new token;
    new: [Hkv, T, D]."""
    return pool.at[:, page_ids, offsets, :].set(new.astype(pool.dtype))


class PagedKVCache:
    def __init__(self, *, kv_heads: int, head_dim: int, num_pages: int,
                 page_size: int = DEFAULT_PAGE_SIZE, max_seqs: int = 64,
                 dtype=jnp.bfloat16):
        if page_size % QUANT_BLOCK:
            raise ValueError(
                f"page_size must be a multiple of {QUANT_BLOCK}"
            )
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_seqs = max_seqs
        self.dtype = dtype
        self.allocator = make_allocator(num_pages, page_size, max_seqs)
        shape = (kv_heads, num_pages, page_size, head_dim)
        self.k_pool = jnp.zeros(shape, dtype)
        self.v_pool = jnp.zeros(shape, dtype)
        self.k_scales = None
        self.v_scales = None

    # --- sequence lifecycle -------------------------------------------

    def add_sequence(self, k_prefix, v_prefix) -> int:
        """Admit a sequence with prefill K/V [Hkv, T, D]. Returns seq_id
        or raises MemoryError when the pool is exhausted."""
        t = k_prefix.shape[1]
        sid = self.allocator.alloc(max(t, 1))
        if sid < 0:
            raise MemoryError("KV pool exhausted")
        if t:
            self._write(sid, 0, k_prefix, v_prefix)
        return sid

    def append_token(self, seq_id: int, k_new, v_new) -> None:
        """Append one token ([Hkv, D]) to a sequence. A last page
        shared with a fork is copy-on-written first."""
        if self.k_scales is not None:
            raise NotImplementedError(
                "appending to a quantized PagedKVCache requires "
                "requantizing the touched page; use LayeredPagedKVCache "
                "(quant_dtype=...) for a read/write quantized cache")
        cur = self.allocator.length(seq_id)
        if cur < 0:
            raise ValueError(f"dead sequence {seq_id}")
        if cur % self.page_size:
            page, copied_from = self.allocator.cow_last_page(seq_id)
            if copied_from >= 0:
                self.k_pool = self.k_pool.at[:, page].set(
                    self.k_pool[:, copied_from])
                self.v_pool = self.v_pool.at[:, page].set(
                    self.v_pool[:, copied_from])
        if not self.allocator.extend(seq_id, cur + 1):
            raise MemoryError("KV pool exhausted")
        self._write(seq_id, cur, k_new[:, None, :], v_new[:, None, :])

    def free_sequence(self, seq_id: int) -> None:
        self.allocator.free(seq_id)

    def fork_sequence(self, seq_id: int) -> int:
        sid = self.allocator.fork(seq_id)
        if sid < 0:
            raise MemoryError("no sequence slot / pages for fork")
        return sid

    def _write(self, seq_id: int, start: int, k_new, v_new) -> None:
        t = k_new.shape[1]
        max_pages = -(-(start + t) // self.page_size)
        table, _ = self.allocator.page_table(seq_id, max_pages)
        pos = np.arange(start, start + t)
        page_ids = jnp.asarray(table[pos // self.page_size], jnp.int32)
        offsets = jnp.asarray(pos % self.page_size, jnp.int32)
        self.k_pool = _write_tokens(self.k_pool, page_ids, offsets, k_new)
        self.v_pool = _write_tokens(self.v_pool, page_ids, offsets, v_new)

    # --- kernel-facing state ------------------------------------------

    def batch_state(self, seq_ids, max_pages: int | None = None):
        """(page_table [B, maxp] int32, lengths [B] int32) for a batch."""
        lengths = np.array(
            [self.allocator.length(s) for s in seq_ids], np.int32
        )
        if max_pages is None:
            max_pages = max(
                1, int(-(-lengths.max() // self.page_size))
            )
        tables = np.stack([
            self.allocator.page_table(s, max_pages)[0] for s in seq_ids
        ])
        return jnp.asarray(tables), jnp.asarray(lengths)

    def decode(self, q, seq_ids, **kw):
        """Attention of q [B, Hq, D] against the cached prefixes."""
        table, lengths = self.batch_state(seq_ids)
        return paged_flash_decode(
            q, self.k_pool, self.v_pool, table, lengths,
            k_scales=self.k_scales, v_scales=self.v_scales, **kw,
        )

    # --- quantization ---------------------------------------------------

    def quantize(self, dtype=jnp.int8) -> None:
        """Convert the pools to int8/fp8 with per-(page, channel-block)
        scales. For read-mostly workloads (prefill once, decode many);
        subsequent appends require requantizing the touched page."""
        qmax = _QMAX[jnp.dtype(dtype)]

        def quant(pool):
            h, p, ps, d = pool.shape
            xf = pool.astype(jnp.float32).reshape(
                h, p, ps // QUANT_BLOCK, QUANT_BLOCK, d
            )
            absmax = jnp.max(jnp.abs(xf), axis=3, keepdims=True)
            scales = jnp.maximum(absmax / qmax, 1e-8)
            q = xf / scales
            if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
                q = jnp.clip(jnp.round(q), -qmax, qmax)
            return q.astype(dtype).reshape(h, p, ps, d), scales[..., 0, :]

        self.k_pool, self.k_scales = quant(self.k_pool)
        self.v_pool, self.v_scales = quant(self.v_pool)
        self.dtype = jnp.dtype(dtype)

    @property
    def hbm_bytes(self) -> int:
        n = self.k_pool.size * self.k_pool.dtype.itemsize * 2
        if self.k_scales is not None:
            n += self.k_scales.size * 4 * 2
        return n


@functools.partial(jax.jit,
                   static_argnames=("page_size", "dtype_name"))
def _gather_pages(k_pools, v_pools, k_scales, v_scales, idx, t,
                  page_size, dtype_name):
    """All-layer cached-page gather for the prefix-cache prefill buffer
    (see LayeredPagedKVCache.gather_pages)."""
    dtype = jnp.dtype(dtype_name)
    hkv = k_pools[0].shape[0]
    d = k_pools[0].shape[3]
    cap = idx.shape[0]
    out_len = cap * page_size
    row = jnp.arange(out_len)

    def gather(pool, scales):
        g = pool[:, idx]                          # [Hkv, cap, ps, D]
        if scales is not None:
            sc = scales[:, idx]                   # [Hkv, cap, ps/QB, D]
            gf = g.astype(jnp.float32).reshape(
                hkv, cap, page_size // QUANT_BLOCK, QUANT_BLOCK, d)
            g = gf * sc[:, :, :, None, :]
        g = g.reshape(hkv, out_len, d)
        return jnp.where(row[None, :, None] < t, g, 0).astype(dtype)

    ks = jnp.stack([
        gather(kp, ks_)[None] for kp, ks_ in zip(
            k_pools, k_scales or [None] * len(k_pools))])
    vs = jnp.stack([
        gather(vp, vs_)[None] for vp, vs_ in zip(
            v_pools, v_scales or [None] * len(v_pools))])
    return ks, vs


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_layered(pools, page_ids, offsets, new):
    """Scatter prefill tokens into per-layer pools (donated: in-place).

    pools: list of [Hkv, P, ps, D]; page_ids/offsets: [T] int32;
    new: [L, Hkv, T, D]."""
    return [
        pool.at[:, page_ids, offsets, :].set(new[li].astype(pool.dtype))
        for li, pool in enumerate(pools)
    ]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("qdtype",))
def _write_layered_quant(k_pools, v_pools, k_scales, v_scales, ks, vs,
                         blk_pages, blk_rows, qdtype):
    """Quantize + scatter block-aligned prefill tokens.

    ks/vs: [L, Hkv, Nb*QUANT_BLOCK, D] (zero-padded past the prompt);
    block n lands at (blk_pages[n], block row blk_rows[n]) of each pool.
    """
    qmax = _QMAX[jnp.dtype(qdtype)]
    nb = blk_pages.shape[0]
    r = jnp.arange(QUANT_BLOCK)
    offs = blk_rows[:, None] * QUANT_BLOCK + r[None, :]     # [Nb, QB]

    def quant_scatter(pool, scales, x):
        l_hkv, t, d = x.shape
        xr = x.astype(jnp.float32).reshape(l_hkv, nb, QUANT_BLOCK, d)
        absmax = jnp.max(jnp.abs(xr), axis=2)               # [Hkv, Nb, D]
        sc = jnp.maximum(absmax / qmax, 1e-8)
        q = xr / sc[:, :, None, :]
        if jnp.dtype(qdtype) == jnp.dtype(jnp.int8):
            q = jnp.clip(jnp.round(q), -qmax, qmax)
        pool = pool.at[:, blk_pages[:, None], offs, :].set(
            q.astype(qdtype))
        scales = scales.at[:, blk_pages, blk_rows, :].set(sc)
        return pool, scales

    nk, nv, nks, nvs = [], [], [], []
    for li, (kp, vp, ksc, vsc) in enumerate(
            zip(k_pools, v_pools, k_scales, v_scales)):
        kp, ksc = quant_scatter(kp, ksc, ks[li])
        vp, vsc = quant_scatter(vp, vsc, vs[li])
        nk.append(kp)
        nv.append(vp)
        nks.append(ksc)
        nvs.append(vsc)
    return nk, nv, nks, nvs


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("qdtype",))
def _flush_layered_quant(k_pools, v_pools, k_scales, v_scales,
                         k_tails, v_tails, b_idx, blk_pages, blk_rows,
                         s_rel, e_rel, tail_base, qdtype):
    """Requant-overlay flush for quantized pools.

    Per affected token-block n (fixed count for compile stability):
    rows r < s_rel[n] keep their existing (dequantized) content, rows
    s_rel<=r<e_rel take tail tokens (tail row = r + tail_base[n] of
    slot b_idx[n]), rows >= e_rel zero. The block requantizes with a
    fresh per-channel scale. Dead entries point at the scratch page.
    """
    qmax = _QMAX[jnp.dtype(qdtype)]
    r = jnp.arange(QUANT_BLOCK)                              # [QB]
    offs = blk_rows[:, None] * QUANT_BLOCK + r[None, :]      # [N, QB]
    tail_len = k_tails[0].shape[2]
    trow = jnp.clip(tail_base[:, None] + r[None, :], 0, tail_len - 1)
    use_new = (r[None, :] >= s_rel[:, None]) & (r[None, :] < e_rel[:, None])
    zero = r[None, :] >= e_rel[:, None]

    def requant(pool, scales, tail):
        cur = pool[:, blk_pages[:, None], offs, :].astype(jnp.float32)
        cur = cur * scales[:, blk_pages, blk_rows, :][:, :, None, :]
        new = tail[b_idx[:, None], :, trow, :]               # [N,QB,Hkv,D]
        new = jnp.moveaxis(new, 2, 0).astype(jnp.float32)    # [Hkv,N,QB,D]
        blk = jnp.where(use_new[None, :, :, None], new, cur)
        blk = jnp.where(zero[None, :, :, None], 0.0, blk)
        absmax = jnp.max(jnp.abs(blk), axis=2)               # [Hkv,N,D]
        sc = jnp.maximum(absmax / qmax, 1e-8)
        q = blk / sc[:, :, None, :]
        if jnp.dtype(qdtype) == jnp.dtype(jnp.int8):
            q = jnp.clip(jnp.round(q), -qmax, qmax)
        pool = pool.at[:, blk_pages[:, None], offs, :].set(
            q.astype(pool.dtype))
        scales = scales.at[:, blk_pages, blk_rows, :].set(sc)
        return pool, scales

    nk, nv, nks, nvs = [], [], [], []
    for kp, vp, ksc, vsc, kt, vt in zip(
            k_pools, v_pools, k_scales, v_scales, k_tails, v_tails):
        kp, ksc = requant(kp, ksc, kt)
        vp, vsc = requant(vp, vsc, vt)
        nk.append(kp)
        nv.append(vp)
        nks.append(ksc)
        nvs.append(vsc)
    return nk, nv, nks, nvs


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_pages(pools, dst, src):
    """Copy page data dst[i] <- src[i] in every layer (COW
    materialization after allocator fork; dead entries are
    scratch -> scratch)."""
    return [p.at[:, dst].set(p[:, src]) for p in pools]


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _flush_layered(k_pools, v_pools, k_tails, v_tails,
                   b_idx, t_idx, page_ids, offsets):
    """Scatter tail tokens into pages, all layers in one dispatch.

    Flat index arrays (fixed length B*TAIL for compile stability):
    entry n writes tails[b_idx[n], :, t_idx[n]] at page_ids[n]/offsets[n];
    dead entries point at the scratch page. Pages donated -> in-place
    (this program contains no Pallas call, so the scatter aliases)."""
    new_k, new_v = [], []
    for kp, vp, kt, vt in zip(k_pools, v_pools, k_tails, v_tails):
        uk = jnp.moveaxis(kt[b_idx, :, t_idx, :], 0, 1)   # [Hkv, N, D]
        uv = jnp.moveaxis(vt[b_idx, :, t_idx, :], 0, 1)
        new_k.append(kp.at[:, page_ids, offsets, :].set(uk.astype(kp.dtype)))
        new_v.append(vp.at[:, page_ids, offsets, :].set(uv.astype(vp.dtype)))
    return new_k, new_v


class LayeredPagedKVCache:
    """Per-layer paged K/V pools sharing one page allocator.

    Pools are LISTS of per-layer [Hkv, P, ps, D] arrays (each layer a
    separate buffer so token scatters update in place; see
    models/llama.py decode_step_paged). A page id indexes the same slot
    in every layer's pool, so one allocator page represents `page_size`
    tokens across ALL layers and heads — sequence bookkeeping stays
    model-agnostic. Page 0 is reserved as a scratch page: dead decode
    slots point their whole page table at it, so their (masked) token
    writes land harmlessly.
    """

    def __init__(self, *, n_layers: int, kv_heads: int, head_dim: int,
                 num_pages: int, page_size: int = DEFAULT_PAGE_SIZE,
                 max_seqs: int = 64, tail_size: int | None = None,
                 dtype=jnp.bfloat16, quant_dtype=None):
        self.n_layers = n_layers
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_seqs = max_seqs
        self.tail_size = tail_size or page_size
        self.dtype = dtype
        # INT8/FP8 pages: values stored quantized with per-(page,
        # token-block, channel) scales; the hot tail stays dense (new
        # tokens quantize at flush, when their block requantizes).
        self.quant_dtype = jnp.dtype(quant_dtype) if quant_dtype else None
        if self.quant_dtype is not None and page_size % QUANT_BLOCK:
            raise ValueError(
                f"page_size must be a multiple of {QUANT_BLOCK} "
                "for quantized pools")
        # +1 slot / +1 page for the reserved scratch sequence.
        self.allocator = make_allocator(num_pages, page_size, max_seqs + 1)
        self._scratch_sid = self.allocator.alloc(1)
        self.scratch_page = int(
            self.allocator.page_table(self._scratch_sid, 1)[0][0]
        )
        shape = (kv_heads, num_pages, page_size, head_dim)
        pool_dtype = self.quant_dtype or dtype
        self.k_pools = [jnp.zeros(shape, pool_dtype)
                        for _ in range(n_layers)]
        self.v_pools = [jnp.zeros(shape, pool_dtype)
                        for _ in range(n_layers)]
        if self.quant_dtype is not None:
            sshape = (kv_heads, num_pages, page_size // QUANT_BLOCK,
                      head_dim)
            self.k_scale_pools = [jnp.full(sshape, 1e-8, jnp.float32)
                                  for _ in range(n_layers)]
            self.v_scale_pools = [jnp.full(sshape, 1e-8, jnp.float32)
                                  for _ in range(n_layers)]
        else:
            self.k_scale_pools = self.v_scale_pools = None
        # Dense hot-tail buffers, slot-indexed (see llama.py
        # decode_step_paged: per-token writes go here, not into pages).
        tshape = (max_seqs, kv_heads, self.tail_size, head_dim)
        self.k_tails = [jnp.zeros(tshape, dtype) for _ in range(n_layers)]
        self.v_tails = [jnp.zeros(tshape, dtype) for _ in range(n_layers)]

    @property
    def free_pages(self) -> int:
        return self.allocator.free_pages

    def pages_for(self, tokens: int) -> int:
        return -(-tokens // self.page_size)

    def add_sequence(self, ks, vs, base_tokens: int = 0) -> int:
        """Admit a sequence with prefill K/V [L, Hkv, T, D] (or reserve
        empty with ks=vs=None and a later write). With `base_tokens`
        (page-aligned), the sequence's first base_tokens positions are
        treated as ALREADY EVICTED (sliding-window admission: ks/vs
        hold only positions [base_tokens, base_tokens + T)); length()
        stays absolute. Returns seq_id; raises MemoryError when the
        pool/slots are exhausted."""
        if base_tokens % self.page_size:
            raise ValueError("base_tokens must be page-aligned")
        t = ks.shape[2] if ks is not None else 1
        sid = self.allocator.alloc(max(base_tokens + t, 1),
                                   base_pages=base_tokens
                                   // self.page_size)
        if sid < 0:
            raise MemoryError("KV pool exhausted")
        if ks is not None and t:
            self.write(sid, base_tokens, ks, vs)
        return sid

    # --- sliding-window eviction ---------------------------------------

    def base_tokens(self, seq_id: int) -> int:
        """Front-evicted tokens of seq (absolute positions below this
        have no pages)."""
        return self.allocator.base(seq_id) * self.page_size

    def evict_below(self, seq_id: int, keep_from: int) -> int:
        """Free whole front pages entirely below absolute position
        `keep_from` (sliding-window reclamation: positions below the
        attention window can never be read again). Returns pages
        freed."""
        target = max(keep_from, 0) // self.page_size
        cur = self.allocator.base(seq_id)
        # Never evict into unpaged territory.
        limit = self.allocator.length(seq_id) // self.page_size
        n = min(target, limit) - cur
        if n > 0:
            self.allocator.pop_front(seq_id, n)
            return n
        return 0

    def extend(self, seq_id: int, new_len: int) -> bool:
        return self.allocator.extend(seq_id, new_len)

    # --- prefix cache -------------------------------------------------

    def add_sequence_prefixed(self, prefix_pages, ks, vs,
                              total_len: int) -> int:
        """Admit a sequence whose first len(prefix_pages)*page_size
        tokens are already resident in cached pages (acquired via
        allocator.cache_match); ks/vs [L, Hkv, T_suffix, D] hold ONLY
        the suffix KV, written after the prefix. Raises MemoryError and
        releases the acquired pages on failure."""
        sid = self.allocator.alloc_prefixed(max(total_len, 1),
                                            prefix_pages)
        if sid < 0:
            self.allocator.cache_release(prefix_pages)
            raise MemoryError("KV pool exhausted")
        start = len(prefix_pages) * self.page_size
        if ks is not None and ks.shape[2]:
            self.write(sid, start, ks, vs)
        return sid

    def register_prefix(self, seq_id: int, tokens) -> int:
        """Register the sequence's full pages under the token chain
        hashes so later prompts sharing the prefix reuse their KV."""
        hashes = page_chain_hashes(tokens, self.page_size)
        if not len(hashes):
            return 0
        return self.allocator.cache_put(seq_id, hashes)

    def match_prefix(self, tokens):
        """(acquired_pages, hashes) for the longest cached prefix of
        `tokens`, capped one page short of covering everything (at
        least one suffix token must be prefilled to produce the first
        logits)."""
        hashes = page_chain_hashes(tokens, self.page_size)
        cap = max((len(tokens) - 1) // self.page_size, 0)
        if not cap:
            return [], hashes
        pages = self.allocator.cache_match(hashes[:cap])
        return pages, hashes

    def gather_pages(self, pages, out_len: int):
        """Dense [L, 1, Hkv, out_len, D] K/V buffers holding the given
        pages' tokens first (dequantized when the pools are quantized),
        zero past them — the chunked-prefill prefix buffer for a cached
        prompt. One jitted dispatch for all layers; the page-id vector
        is padded to the bucket's page count so every request of the
        same bucket reuses one compiled program."""
        cap = out_len // self.page_size
        idx = np.zeros(cap, np.int32)
        idx[: len(pages)] = list(pages)
        return _gather_pages(
            self.k_pools, self.v_pools,
            self.k_scale_pools, self.v_scale_pools,
            jnp.asarray(idx), np.int32(len(pages) * self.page_size),
            self.page_size, jnp.dtype(self.dtype).name)

    def release_pages(self, pages) -> None:
        self.allocator.cache_release(pages)

    def fork_sequence(self, seq_id: int) -> int:
        """Fork: the new sequence shares every page (refcounted); page
        DATA diverges lazily — flush_tails copies a shared boundary page
        (copy-on-write) before writing into it."""
        sid = self.allocator.fork(seq_id)
        if sid < 0:
            raise MemoryError("no sequence slot for fork")
        return sid

    def _cow_boundary(self, sid: int, start: int):
        """Before a flush writes into the page containing `start`, give
        the sequence an exclusive copy if that page is shared. Returns
        (dst, src) page ids to copy, or None."""
        if start == 0 or start % self.page_size == 0:
            return None        # flush starts on a fresh (exclusive) page
        page, copied_from = self.allocator.cow_last_page(sid)
        if copied_from < 0:
            return None
        return page, copied_from

    def free_sequence(self, seq_id: int) -> None:
        self.allocator.free(seq_id)

    def length(self, seq_id: int) -> int:
        return self.allocator.length(seq_id)

    def write(self, seq_id: int, start: int, ks, vs) -> None:
        """Write ks/vs [L, Hkv, T, D] at token offset `start`,
        extending the allocation to cover it (a pre-reserved sequence
        shorter than the write would otherwise scribble into the
        page-table fill value)."""
        t = ks.shape[2]
        if self.allocator.length(seq_id) < start + t:
            if not self.allocator.extend(seq_id, start + t):
                raise MemoryError("KV pool exhausted during write")
        if start // self.page_size < self.allocator.base(seq_id):
            raise ValueError(
                f"write at {start} below evicted base "
                f"({self.base_tokens(seq_id)})")
        table = self._abs_table(seq_id, start + t)
        if self.quant_dtype is not None:
            if start % QUANT_BLOCK:
                raise ValueError("quantized bulk writes must be "
                                 "token-block aligned")
            nb = -(-t // QUANT_BLOCK)
            pad = nb * QUANT_BLOCK - t
            if pad:
                ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad), (0, 0)))
            gblk = start // QUANT_BLOCK + np.arange(nb)
            blk_pages = jnp.asarray(
                table[gblk * QUANT_BLOCK // self.page_size], jnp.int32)
            blk_rows = jnp.asarray(
                (gblk * QUANT_BLOCK % self.page_size) // QUANT_BLOCK,
                jnp.int32)
            (self.k_pools, self.v_pools, self.k_scale_pools,
             self.v_scale_pools) = _write_layered_quant(
                self.k_pools, self.v_pools,
                self.k_scale_pools, self.v_scale_pools,
                ks, vs, blk_pages, blk_rows, self.quant_dtype)
            return
        pos = np.arange(start, start + t)
        page_ids = jnp.asarray(table[pos // self.page_size], jnp.int32)
        offsets = jnp.asarray(pos % self.page_size, jnp.int32)
        self.k_pools = _write_layered(self.k_pools, page_ids, offsets, ks)
        self.v_pools = _write_layered(self.v_pools, page_ids, offsets, vs)

    def _abs_table(self, sid: int, end_tokens: int):
        """Page table indexable by ABSOLUTE page number (front-evicted
        entries poisoned with -1; callers only index >= base)."""
        base = self.allocator.base(sid)
        live = self.pages_for(end_tokens) - base
        tbl, _ = self.allocator.page_table(sid, live)
        if not base:
            return tbl
        out = np.full(base + live, -1, np.int32)
        out[base:] = tbl
        return out

    def batch_state(self, seq_ids, max_pages: int):
        """(page_tables [B, max_pages] int32, lengths [B] int32). Dead
        slots (seq_id < 0) get length 0 and a scratch-page table.

        Both outputs are in STORED coordinates: a front-evicted
        sequence's table starts at its first live page and its length
        counts live paged tokens (absolute length minus base_tokens) —
        exactly what the paged kernel masks against. Absolute positions
        (for RoPE) = bases(seq_ids) + lengths (+ tail)."""
        tables = np.full((len(seq_ids), max_pages), self.scratch_page,
                         np.int32)
        lengths = np.zeros(len(seq_ids), np.int32)
        for i, sid in enumerate(seq_ids):
            if sid is None or sid < 0:
                continue
            lengths[i] = (self.allocator.length(sid)
                          - self.allocator.base(sid) * self.page_size)
            tbl, n = self.allocator.page_table(
                sid, max_pages, fill=self.scratch_page
            )
            tables[i] = tbl
        return jnp.asarray(tables), jnp.asarray(lengths)

    def bases(self, seq_ids):
        """[B] int32 front-evicted TOKENS per slot (0 for dead)."""
        return jnp.asarray([
            0 if (sid is None or sid < 0)
            else self.allocator.base(sid) * self.page_size
            for sid in seq_ids], jnp.int32)

    def live_pages(self, seq_ids) -> int:
        """Max STORED pages over the batch (>= 1) — the page-table
        width actually needed by a decode dispatch. The paged kernel's
        grid is (B, table_width) per layer, so dispatching with the
        engine-wide max_pages (e.g. 512 at 128K max_seq_len) makes
        every decode step pay B x 512 mostly-masked grid steps per
        layer regardless of the live context."""
        need = 1
        for sid in seq_ids:
            if sid is None or sid < 0:
                continue
            ln = (self.allocator.length(sid)
                  - self.allocator.base(sid) * self.page_size)
            need = max(need, -(-ln // self.page_size))
        return need

    def flush_tails(self, slot_sids, counts) -> None:
        """Move each slot's first counts[i] tail tokens into its pages
        (one donated dispatch across all layers), extending allocations.
        The caller resets its tail counters afterwards; tail rows become
        stale and are masked by tail_pos in the decode step."""
        if self.quant_dtype is not None:
            return self._flush_tails_quant(slot_sids, counts)
        b = self.max_seqs
        t = self.tail_size
        pids = np.full((b * t,), self.scratch_page, np.int32)
        offs = np.zeros((b * t,), np.int32)
        b_idx = np.repeat(np.arange(b), t).astype(np.int32)
        t_idx = np.tile(np.arange(t), b).astype(np.int32)
        cows = []
        for i, (sid, cnt) in enumerate(zip(slot_sids, counts)):
            if sid is None or sid < 0 or cnt == 0:
                continue
            start = self.allocator.length(sid)
            cow = self._cow_boundary(sid, start)
            if cow is not None:
                cows.append(cow)
            if not self.allocator.extend(sid, start + int(cnt)):
                raise MemoryError("KV pool exhausted during tail flush")
            table = self._abs_table(sid, start + int(cnt))
            pos = np.arange(start, start + int(cnt))
            pids[i * t: i * t + int(cnt)] = table[pos // self.page_size]
            offs[i * t: i * t + int(cnt)] = pos % self.page_size
        self._apply_cows(cows)
        self.k_pools, self.v_pools = _flush_layered(
            self.k_pools, self.v_pools, self.k_tails, self.v_tails,
            jnp.asarray(b_idx), jnp.asarray(t_idx),
            jnp.asarray(pids), jnp.asarray(offs))

    def _apply_cows(self, cows) -> None:
        if not cows:
            return
        dst = jnp.asarray([c[0] for c in cows], jnp.int32)
        src = jnp.asarray([c[1] for c in cows], jnp.int32)
        self.k_pools = _copy_pages(self.k_pools, dst, src)
        self.v_pools = _copy_pages(self.v_pools, dst, src)
        if self.quant_dtype is not None:
            self.k_scale_pools = _copy_pages(self.k_scale_pools, dst, src)
            self.v_scale_pools = _copy_pages(self.v_scale_pools, dst, src)

    def _flush_tails_quant(self, slot_sids, counts) -> None:
        """Quantized flush: requantize every token-block the tail tokens
        touch (existing rows dequant + overlay + fresh scale)."""
        b = self.max_seqs
        # Max token-blocks a flush of <= tail_size tokens can touch at
        # ANY alignment: (cnt-1) spans (cnt+QB-2)//QB block boundaries.
        mb = (self.tail_size + QUANT_BLOCK - 2) // QUANT_BLOCK + 1
        n = b * mb
        blk_pages = np.full((n,), self.scratch_page, np.int32)
        blk_rows = np.zeros((n,), np.int32)
        b_idx = np.repeat(np.arange(b), mb).astype(np.int32)
        s_rel = np.zeros((n,), np.int32)
        e_rel = np.zeros((n,), np.int32)
        tail_base = np.zeros((n,), np.int32)
        cows = []
        for i, (sid, cnt) in enumerate(zip(slot_sids, counts)):
            if sid is None or sid < 0 or cnt == 0:
                continue
            start = self.allocator.length(sid)
            cow = self._cow_boundary(sid, start)
            if cow is not None:
                cows.append(cow)
            end = start + int(cnt)
            if not self.allocator.extend(sid, end):
                raise MemoryError("KV pool exhausted during tail flush")
            table = self._abs_table(sid, end)
            g0, g1 = start // QUANT_BLOCK, (end - 1) // QUANT_BLOCK
            for j, g in enumerate(range(g0, g1 + 1)):
                nidx = i * mb + j
                gs = g * QUANT_BLOCK
                blk_pages[nidx] = table[gs // self.page_size]
                blk_rows[nidx] = (gs % self.page_size) // QUANT_BLOCK
                s_rel[nidx] = max(start - gs, 0)
                e_rel[nidx] = min(end - gs, QUANT_BLOCK)
                tail_base[nidx] = gs - start
        self._apply_cows(cows)
        (self.k_pools, self.v_pools, self.k_scale_pools,
         self.v_scale_pools) = _flush_layered_quant(
            self.k_pools, self.v_pools,
            self.k_scale_pools, self.v_scale_pools,
            self.k_tails, self.v_tails,
            jnp.asarray(b_idx), jnp.asarray(blk_pages),
            jnp.asarray(blk_rows), jnp.asarray(s_rel),
            jnp.asarray(e_rel), jnp.asarray(tail_base),
            self.quant_dtype)

    @property
    def hbm_bytes(self) -> int:
        n = 2 * sum(p.size * p.dtype.itemsize for p in self.k_pools)
        n += 2 * sum(p.size * p.dtype.itemsize for p in self.k_tails)
        return n
