"""Continuous-batching serving engine over the paged KV cache.

North-star subsystem (BASELINE.json: "paged KV-cache blocks feed a
continuous-batching decode loop") with no reference counterpart — the
reference has no inference runtime at all (SURVEY.md §5, "checkpoint /
resume: none; failure detection: none").

Design, TPU-first:

  * XLA wants static shapes, so "continuous batching" is a fixed-width
    slot array: `max_batch` decode slots, each holding one live sequence
    or a dead marker. One jitted `decode_step_paged` call advances every
    slot per engine step; dead slots carry length 0 (fully masked
    attention) and point their page tables at a reserved scratch page so
    their token writes are harmless. Slot recycling — admit into a slot
    the moment its sequence finishes — is the host-side scheduler's job
    and costs no recompilation.
  * Prefill runs per admitted request, padded to a compile-size bucket
    (powers of two), so arbitrary prompt lengths hit a handful of
    compiled programs. Prompt KV is scattered into pages in one fused
    update; the first token samples from the prefill logits.
  * Admission control reserves worst-case pages (prompt + max_new_tokens)
    for every live sequence, so a mid-flight `extend` can never fail and
    no preemption path is needed — the allocator's free count minus
    outstanding reservations gates admission (head-of-line FIFO).
  * The KV pools are donated through the jitted decode step, so the
    update is in-place in HBM; per step the only host<->device traffic
    is the token ids in and sampled ids out.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import itertools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step,
    decode_step_paged,
    decode_step_paged_multi,
    init_kv_cache,
    prefill_chunk_step,
    prefill_kv,
    prefill_window_chunk_step,
    serving_param_shardings,
)
from flash_attention_tpu.runtime.kv_cache import (
    DEFAULT_PAGE_SIZE,
    LayeredPagedKVCache,
)

_req_counter = itertools.count()


@dataclasses.dataclass
class Request:
    prompt: Any                       # [T] int array-like of token ids
    max_new_tokens: int = 32
    temperature: float = 0.0          # 0 = greedy
    top_p: float = 0.0                # nucleus mass (0/1 = off)
    eos_id: int | None = None
    n: int = 1                        # parallel completions: ONE prefill,
                                      # n-1 allocator forks (pages shared,
                                      # copy-on-write at flush boundaries)
    request_id: int = dataclasses.field(
        default_factory=lambda: next(_req_counter))
    submit_ts: float | None = None    # set by Engine.submit (TTFT clock)


@dataclasses.dataclass
class Completion:
    request_id: int
    prompt_len: int
    tokens: list                      # generated token ids
    finish_reason: str                # "stop" | "length" | "rejected"
    error: str | None = None          # reason text when rejected
    branch: int = 0                   # which of the request's n samples
    ttft_s: float | None = None       # submit -> first token (branch 0)


@dataclasses.dataclass
class _Slot:
    request: Request
    seq_id: int
    prompt_len: int
    length: int                       # tokens whose KV is in the cache
    tail: int                         # of which, in the hot-tail buffer
    next_token: int                   # fed into the next decode step
    generated: list
    worst_pages: int                  # admission reservation
    branch: int = 0                   # fork index within the request
    ttft_s: float | None = None


@dataclasses.dataclass
class _PrefillTask:
    """In-flight chunked prefill: the prompt advances `chunk` tokens per
    engine step while live decode slots keep decoding between chunks."""
    request: Request
    prompt: Any                       # np.int32 [T]
    bucket: int                       # padded KV-buffer length
    chunk: int                        # tokens per engine step
    done: int                         # tokens processed so far
    k_bufs: Any                       # [L, 1, Hkv, bucket, D]
    v_bufs: Any
    logits: Any                       # last chunk's logits [1, vocab]
    need_pages: int                   # admission reservation (all forks)
    worst: int                        # branch-0 reservation
    branch_worst: int
    prefix_pages: tuple = ()          # cached pages reused (prefix cache)
    windowed: bool = False            # k/v_bufs are a ROLLING window
                                      # buffer (prefill_window_chunk_step);
                                      # done counts are real, but the
                                      # buffer content shifts by `chunk`
                                      # per dispatch (padded_done tracks
                                      # that).
    padded_done: int = 0
    first_token: int | None = None    # pre-sampled (group-batched) first
                                      # token; None -> sample at install


@dataclasses.dataclass
class EngineStats:
    prefill_tokens: int = 0
    prefix_cached_tokens: int = 0     # prompt tokens served from cache
    decode_tokens: int = 0
    spec_proposed: int = 0            # draft tokens offered
    spec_accepted: int = 0            # draft tokens confirmed
    engine_steps: int = 0
    rejected: int = 0                 # infeasible requests rejected
    peak_pages: int = 0               # max pages in use at any step
    prefill_s: float = 0.0
    decode_s: float = 0.0             # incl. the fused draft+verify
                                      # dispatch under model drafting
    # Wall-time breakdown of the non-dispatch engine step (observability
    # for serving-latency diagnosis; `serve-bench --trace` prints it):
    admit_s: float = 0.0              # _try_admit (incl. prefix probes)
    flush_s: float = 0.0              # tail flush + window eviction
    book_s: float = 0.0               # host-side batch assembly
    ttft_s: list = dataclasses.field(default_factory=list)

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.decode_s if self.decode_s else 0.0

    def ttft_percentiles(self) -> dict:
        """p50/p90/p99 time-to-first-token over completed requests
        (seconds). BASELINE.json names p50 TTFT as a driver metric."""
        if not self.ttft_s:
            return {}
        v = np.sort(np.asarray(self.ttft_s))
        pick = lambda p: float(v[min(len(v) - 1, int(p * len(v)))])  # noqa: E731
        return {"p50": pick(0.50), "p90": pick(0.90), "p99": pick(0.99)}



def _hard_sync(x) -> None:
    """Force completion of everything feeding `x`. On the axon (tunneled
    PJRT) platform `jax.block_until_ready` can return before execution
    completes; a 1-element readback is the reliable barrier (same trick
    as utils/bench.device_sync)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def propose_ngram_draft(history, k: int, ngram: int = 2):
    """Prompt-lookup draft: find the most recent earlier occurrence of
    the history's trailing `ngram` and propose the k tokens that
    followed it (padded with the continuation's last token when it runs
    short). No match (or too-short history) proposes the last token
    repeated — a harmless low-acceptance draft. Host-side numpy; the
    model itself is the only verifier, so speculation can never change
    greedy output."""
    h = np.asarray(history, np.int32)
    n = len(h)
    if n == 0:
        return np.zeros(k, np.int32)
    if n >= ngram + 1:
        pat = h[-ngram:]
        w = np.lib.stride_tricks.sliding_window_view(h[:-1], ngram)
        starts = np.nonzero((w == pat).all(axis=1))[0]
        if len(starts):
            st = int(starts[-1])
            cont = h[st + ngram: st + ngram + k]
            out = np.empty(k, np.int32)
            out[: len(cont)] = cont
            out[len(cont):] = cont[-1]
            return out
    return np.full(k, h[-1], np.int32)


def _bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Engine:
    """Continuous-batching engine for a Llama-class model."""

    def __init__(self, params, cfg: LlamaConfig, *, max_batch: int = 8,
                 num_pages: int = 128, page_size: int = DEFAULT_PAGE_SIZE,
                 max_seq_len: int | None = None, cache_dtype=None,
                 tail_size: int | None = None, kv_quant_dtype=None,
                 decode_chunk: int = 1, prefill_chunk: int | None = None,
                 prefix_cache: bool = False, speculative_k: int = 0,
                 speculative_rounds: int = 1,
                 max_decode_stall: int = 4, draft_fn=None,
                 draft_params=None, draft_cfg=None, draft_max_seq=None,
                 prefill_hbm_budget: int | None = None,
                 mesh=None, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.mesh = mesh
        if max_seq_len is None:
            max_seq_len = num_pages * page_size
        self.max_seq_len = max_seq_len
        self.max_pages = -(-max_seq_len // page_size)
        self.cache = LayeredPagedKVCache(
            n_layers=cfg.n_layers, kv_heads=cfg.n_kv_heads,
            head_dim=cfg.head_dim, num_pages=num_pages,
            page_size=page_size, max_seqs=max_batch,
            tail_size=tail_size, dtype=cache_dtype or cfg.dtype,
            quant_dtype=kv_quant_dtype,
        )
        self.slots: list[_Slot | None] = [None] * max_batch
        self.pending: collections.deque[Request] = collections.deque()
        self.prefilling: collections.deque[_PrefillTask] = \
            collections.deque()
        self.stats = EngineStats()
        self._key = jax.random.PRNGKey(seed)
        # Decode-stall lease (see step()): consecutive prefill-only
        # steps allowed while live decode slots wait.
        self.max_decode_stall = max(0, int(max_decode_stall))
        self._decode_stalled = 0
        # Optional per-step trace: set to [] to record
        # (t_start, dur_s, kind, live, pending, prefilling) per step.
        self.trace: list | None = None
        # Debug: block after every dispatch so trace/stat brackets
        # attribute device time to the dispatch that incurred it
        # (async dispatch otherwise bills it to the next sync point).
        self._sync_debug = bool(os.environ.get("FA_TPU_SYNC_STEPS"))

        # Chunked prefill (TTFT): admit prompts as _PrefillTasks that
        # advance `prefill_chunk` tokens per engine step, interleaved
        # with decode. None = monolithic prefill at admission (lowest
        # overhead when no decode traffic competes).
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError("prefill_chunk must be >= 1")
        self.prefill_chunk = prefill_chunk

        # Automatic prefix caching (RadixAttention-style): prompt pages
        # are content-addressed by token chain hashes in the page
        # allocator; a new prompt sharing a cached page-aligned prefix
        # reuses those pages and prefills only the suffix (through the
        # chunked-prefill machinery, whose prefix buffer is gathered
        # from the cached pages). Freed pages stay resident until
        # memory pressure evicts them LRU, so capacity is unaffected.
        self.prefix_cache = prefix_cache
        # gather_pages fills prefix buffers in whole pages and prefill
        # buckets are powers of two — a non-power-of-two page size could
        # leave the buffer short of the bucket and shape-mismatch the
        # chunked-prefill k_bufs path.
        if prefix_cache and (page_size & (page_size - 1)):
            raise ValueError(
                f"prefix_cache requires a power-of-two page_size "
                f"(got {page_size})")

        self.decode_chunk = max(1, decode_chunk)
        if self.decode_chunk >= self.cache.tail_size:
            raise ValueError("decode_chunk must be < tail_size")

        # Sliding-window models (cfg.window) run the FULL feature stack:
        # chunked prefill uses a fixed-width rolling KV buffer
        # (llama.prefill_window_chunk_step — O(window) prefill reads,
        # prompt length never enters the compile shape), the prefix
        # cache seeds that buffer (compute reuse; page sharing is
        # skipped since below-window pages evict), speculation gets
        # exact per-position window starts in the paged kernel, and
        # below-window pages are RECLAIMED after every flush
        # (cache.evict_below), so a 64K-context/4K-window sequence
        # holds O(window) pages.
        self._wbuf = None
        if cfg.window is not None:
            if cfg.window <= self.cache.tail_size:
                raise ValueError(
                    f"window={cfg.window} must exceed tail_size "
                    f"({self.cache.tail_size})")
            if prefill_chunk is not None or prefix_cache:
                # Rolling-buffer width: window, rounded out for (a) the
                # page-aligned eviction base (stored KV at install may
                # reach window + page_size - 1) and (b) the final
                # chunk's padding shift (up to chunk - 1 garbage rows
                # roll in before install slices the real span).
                c = 1 << ((prefill_chunk or cfg.window).bit_length() - 1)
                c = min(c, cfg.window)
                self._wchunk = c
                self._wbuf = (-(-cfg.window // page_size) * page_size
                              + page_size + c)
                # Each in-flight windowed prefill task holds TWO
                # [L, 1, hkv, wbuf, D] rolling buffers in HBM until its
                # final chunk installs (~1.3 GB for a 7B at window 4K).
                # Slots alone don't bound that commitment — admission
                # additionally budgets total rolling-buffer bytes
                # (default 4 GiB; always admits at least one task so
                # oversized windows still make progress).
                self._wbuf_task_bytes = (
                    2 * cfg.n_layers * cfg.n_kv_heads * self._wbuf
                    * cfg.head_dim * jnp.dtype(cfg.dtype).itemsize)
                if prefill_hbm_budget is None:
                    prefill_hbm_budget = 4 << 30
            peak = self.cache.pages_for(
                cfg.window + page_size + self.cache.tail_size)
            if peak > self.max_pages:
                raise ValueError(
                    f"max_seq_len {max_seq_len} gives a {self.max_pages}"
                    f"-page table, smaller than the windowed live peak "
                    f"({peak} pages); raise max_seq_len/num_pages")
        self._prefill_hbm_budget = prefill_hbm_budget

        # Speculative decoding: each engine step feeds [next_token,
        # k drafts] through ONE multi-token decode dispatch (one weight
        # read for k+1 positions) and accepts via on-device rejection
        # sampling (models/sampling.py speculative_sample) — greedy
        # transcripts are provably unchanged and sampled requests keep
        # their exact sampling law; the win is fewer weight reads and
        # host syncs per token. Rejected tail rows simply stay stale
        # behind tail_pos. Drafts come from `draft_fn(history, k) ->
        # [k] int tokens` — default n-gram prompt lookup
        # (propose_ngram_draft); pass a small-model/extra-head callable
        # for model-based drafting. MoE caveat: expert routing groups
        # the k+1 positions together, so under CAPACITY DROPS (which
        # are batch-composition-dependent) MoE outputs can differ from
        # the sequential path — run MoE speculation with drop-free
        # capacity (cf >= top_k * E / n) for strict transcript
        # equality.
        self.speculative_k = max(0, int(speculative_k))
        # speculative_rounds > 1 STACKS the two dispatch-amortization
        # strategies (round 4's composition residue): R rounds of
        # (draft scan -> verify -> accept) run inside ONE dispatch, so
        # a step emits up to R*(k+1) tokens per host sync. Requires
        # model-based drafts — a host draft_fn cannot run in-graph.
        self.speculative_rounds = max(1, int(speculative_rounds))
        self.draft_fn = draft_fn or propose_ngram_draft
        # Optional richer draft protocol: draft_fn(history, k,
        # request_id=...) — lets harness oracles key by request
        # identity instead of re-deriving it from the history.
        import inspect
        try:
            self._draft_takes_id = "request_id" in \
                inspect.signature(self.draft_fn).parameters
        except (TypeError, ValueError):
            self._draft_takes_id = False
        if self.speculative_k:
            if decode_chunk > 1:
                raise ValueError(
                    "speculative_k and decode_chunk>1 are mutually "
                    "exclusive decode strategies (speculative_rounds "
                    "is the stacking mechanism)")
            step_span = (self.speculative_k + 1) * self.speculative_rounds
            if step_span >= self.cache.tail_size:
                raise ValueError(
                    f"(speculative_k + 1) * speculative_rounds "
                    f"({step_span}) must be < tail_size "
                    f"({self.cache.tail_size})")
        if self.speculative_rounds > 1 and draft_params is None:
            raise ValueError(
                "speculative_rounds > 1 requires a draft model "
                "(draft_params/draft_cfg): host draft_fn hooks cannot "
                "run inside the fused multi-round dispatch")

        # Model-based drafting: a small Llama-class draft model shares
        # the engine loop with its own per-slot contiguous KV cache.
        # Each engine step runs ONE fused dispatch of k+1 draft decode
        # steps (a lax.scan feeding greedy tokens back — the per-slot
        # host `draft_fn` protocol cannot batch this), then the normal
        # speculative verify. The (k+1)-th draft step is compute whose
        # output is discarded: it ingests the k-th draft's KV so the
        # all-accepted case leaves no hole in the draft cache. Draft
        # cache invariant between steps: rows [0, _draft_len[b]) hold KV
        # for every transcript token EXCEPT the pending next_token;
        # after a verify accepting `a` drafts, _draft_len += a + 1 (the
        # scan wrote positions len..len+k, of which len..len+a are now
        # confirmed; rejected rows above are overwritten by the next
        # scan before they are ever unmasked). Greedy (point-mass)
        # drafts keep speculative_sample's exactness guarantee, so the
        # draft model can be ARBITRARILY wrong without changing any
        # transcript — quality only moves the acceptance rate.
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        if draft_params is not None:
            if not self.speculative_k:
                raise ValueError("draft_params requires speculative_k")
            if draft_cfg is None:
                raise ValueError("draft_params requires draft_cfg")
            if mesh is not None:
                raise NotImplementedError(
                    "model-based drafts under TP serving: run the "
                    "draft replicated outside the mesh (future work)")
            S = int(draft_max_seq or min(self.max_seq_len, 8192))
            self._draft_S = S
            self._draft_caches = init_kv_cache(draft_cfg, max_batch, S)
            self._draft_len = np.zeros(max_batch, np.int32)
            k = self.speculative_k
            dcfg = draft_cfg

            def _draft_scan(dparams, tok0, caches, lens):
                lens = jnp.minimum(lens, S - (k + 2))

                def body(carry, _):
                    tok, caches, lens = carry
                    logits, caches, lens = decode_step(
                        dparams, tok, dcfg, caches, lens,
                        use_flash=False)
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    return (nxt, caches, lens), nxt

                (_, caches, _), drafts = jax.lax.scan(
                    body, (tok0, caches, lens), None, length=k + 1)
                return jnp.moveaxis(drafts, 0, 1)[:, :k], caches

            # Raw (unjitted): fused with the verify program below into
            # ONE dispatch per engine step.
            self._draft_scan_raw = _draft_scan

            def _draft_prefill(dparams, tokens, true_len):
                _, ks, vs = prefill_kv(dparams, tokens, dcfg,
                                       true_len=true_len)
                return ks, vs

            self._draft_prefill_fn = jax.jit(_draft_prefill)

            def _draft_install(caches, ks, vs, slot):
                # ks/vs: [L, 1, Hkv, tb, D]; rows past the true length
                # are pad garbage, masked by _draft_len until each is
                # overwritten by the scan's sequential writes.
                out = []
                for li, (ck, cv) in enumerate(caches):
                    ck = jax.lax.dynamic_update_slice(
                        ck, ks[li].astype(ck.dtype), (slot, 0, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, vs[li].astype(cv.dtype), (slot, 0, 0, 0))
                    out.append((ck, cv))
                return out

            self._draft_install_fn = jax.jit(
                _draft_install, donate_argnums=(0,))

        # --- TP sharding (mesh mode) ---------------------------------
        # Engine under a mesh: params laid out per
        # serving_param_shardings, KV pools/tails sharded over the tp
        # axis on their kv-head dim, every model dispatch a shard_map
        # whose per-block psum + logits all-gather ride the innermost
        # mesh axis. Host-side scheduling is unchanged — the scheduler
        # never looks inside device arrays.
        tp_axis = None
        self._buf_spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tp_axis = "tp"
            tp = mesh.shape["tp"]
            from flash_attention_tpu.models.quantized import (
                expand_param_shardings,
            )
            pspecs = expand_param_shardings(
                params, serving_param_shardings(cfg, tp))
            self.params = params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, pspecs)
            pool_spec = [P("tp", None, None, None)] * cfg.n_layers
            tail_spec = [P(None, "tp", None, None)] * cfg.n_layers
            scale_spec = (pool_spec if kv_quant_dtype is not None
                          else P())
            self._buf_spec = P(None, None, "tp", None, None)

            def put(arrs, spec):
                return [jax.device_put(a, NamedSharding(mesh, s))
                        for a, s in zip(arrs, spec)]

            self.cache.k_pools = put(self.cache.k_pools, pool_spec)
            self.cache.v_pools = put(self.cache.v_pools, pool_spec)
            self.cache.k_tails = put(self.cache.k_tails, tail_spec)
            self.cache.v_tails = put(self.cache.v_tails, tail_spec)
            if kv_quant_dtype is not None:
                self.cache.k_scale_pools = put(
                    self.cache.k_scale_pools, pool_spec)
                self.cache.v_scale_pools = put(
                    self.cache.v_scale_pools, pool_spec)

        def _decode(params, token, k_pages, v_pages, k_tails, v_tails,
                    tables, paged_lens, tail_pos, bases, k_scales,
                    v_scales):
            return decode_step_paged(
                params, token, cfg, k_pages, v_pages, k_tails, v_tails,
                tables, paged_lens, tail_pos, k_scales=k_scales,
                v_scales=v_scales, paged_bases=bases, tp_axis=tp_axis)

        def _decode_chunk(params, token, k_pages, v_pages, k_tails,
                          v_tails, tables, paged_lens, tail_pos, bases,
                          k_scales, v_scales, temps, top_ps, key):
            """decode_chunk steps fused in one program: the sampled
            token feeds the next step on-device; ONE host sync per
            chunk instead of per token (the tunnel round-trip otherwise
            dominates at tens of ms)."""
            def body(carry, i):
                tok, kt, vt = carry
                logits, kt, vt = decode_step_paged(
                    params, tok, cfg, k_pages, v_pages, kt, vt,
                    tables, paged_lens, tail_pos + i,
                    k_scales=k_scales, v_scales=v_scales,
                    paged_bases=bases, tp_axis=tp_axis)
                from flash_attention_tpu.models.sampling import (
                    apply_top_p,
                )

                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

                def categorical(_):
                    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
                    scaled = apply_top_p(scaled, top_ps)
                    return jax.random.categorical(
                        jax.random.fold_in(key, i), scaled, axis=-1
                    ).astype(jnp.int32)

                # All-greedy batches skip the categorical branch: its
                # nucleus filter sorts [B, vocab] EVERY decode step
                # (~25 ms at 128K vocab — 7x the whole model's weight
                # read), which made fused decode 10x slower than the
                # roofline for the common greedy workload.
                cat = jax.lax.cond(
                    jnp.any(temps > 0.0), categorical,
                    lambda _: greedy, operand=None)
                nxt = jnp.where(temps <= 0.0, greedy, cat)
                return (nxt, kt, vt), nxt
            (_, k_tails, v_tails), toks = jax.lax.scan(
                body, (token, k_tails, v_tails),
                jnp.arange(self.decode_chunk))
            return toks, k_tails, v_tails

        def _spec(params, tokens, k_pages, v_pages, k_tails, v_tails,
                  tables, paged_lens, tail_pos, bases, k_scales,
                  v_scales, temps, top_ps, key):
            """Speculative verify: k+1 positions in one dispatch, the
            rejection-sampling acceptance computed ON DEVICE (sampling
            law provably unchanged — models/sampling.py
            speculative_sample); only [B, k+1] tokens + [B] accept
            counts travel back to the host."""
            from flash_attention_tpu.models.sampling import (
                speculative_sample,
            )

            logits, kt, vt = decode_step_paged_multi(
                params, tokens, cfg, k_pages, v_pages, k_tails, v_tails,
                tables, paged_lens, tail_pos,
                k_scales=k_scales, v_scales=v_scales, paged_bases=bases,
                tp_axis=tp_axis)
            out, accepted = speculative_sample(
                logits, tokens, temps, top_ps, key)
            return out, accepted, kt, vt

        def _prefill(params, tokens, true_len):
            return prefill_kv(params, tokens, cfg, true_len=true_len,
                              tp_axis=tp_axis)

        def _prefill_chunk(params, tokens, k_bufs, v_bufs, prefix,
                           true_count):
            return prefill_chunk_step(
                params, tokens, cfg, k_bufs, v_bufs, prefix, true_count,
                tp_axis=tp_axis)

        def _prefill_wchunk(params, tokens, k_roll, v_roll, prefix,
                            true_count):
            return prefill_window_chunk_step(
                params, tokens, cfg, k_roll, v_roll, prefix, true_count,
                tp_axis=tp_axis)

        if mesh is not None:
            shmap = functools.partial(
                jax.shard_map, mesh=mesh, check_vma=False)
            rep = P()
            _decode = shmap(
                _decode,
                in_specs=(pspecs, rep, pool_spec, pool_spec, tail_spec,
                          tail_spec, rep, rep, rep, rep, scale_spec,
                          scale_spec),
                out_specs=(rep, tail_spec, tail_spec))
            _decode_chunk = shmap(
                _decode_chunk,
                in_specs=(pspecs, rep, pool_spec, pool_spec, tail_spec,
                          tail_spec, rep, rep, rep, rep, scale_spec,
                          scale_spec, rep, rep, rep),
                out_specs=(rep, tail_spec, tail_spec))
            _spec = shmap(
                _spec,
                in_specs=(pspecs, rep, pool_spec, pool_spec, tail_spec,
                          tail_spec, rep, rep, rep, rep, scale_spec,
                          scale_spec, rep, rep, rep),
                out_specs=(rep, rep, tail_spec, tail_spec))
            kv_out = P(None, None, "tp", None, None)
            _prefill = shmap(
                _prefill, in_specs=(pspecs, rep, rep),
                out_specs=(rep, kv_out, kv_out))
            _prefill_chunk = shmap(
                _prefill_chunk,
                in_specs=(pspecs, rep, self._buf_spec, self._buf_spec,
                          rep, rep),
                out_specs=(rep, self._buf_spec, self._buf_spec))
            _prefill_wchunk = shmap(
                _prefill_wchunk,
                in_specs=(pspecs, rep, self._buf_spec, self._buf_spec,
                          rep, rep),
                out_specs=(rep, self._buf_spec, self._buf_spec))

        # Tails are donated (mutated per step); pages are read-only in
        # the decode step and flushed separately (kv_cache.flush_tails).
        self._decode_fn = jax.jit(_decode, donate_argnums=(4, 5))
        self._spec_fn = jax.jit(_spec, donate_argnums=(4, 5))
        if draft_params is not None:
            raw_scan = self._draft_scan_raw
            n_rounds = self.speculative_rounds

            def _spec_draft(params, dparams, tok0, dcaches, dlens,
                            k_pages, v_pages, k_tails, v_tails, tables,
                            paged_lens, tail_pos, bases, k_scales,
                            v_scales, temps, top_ps, key):
                """R rounds of (draft scan -> verify -> accept) in ONE
                program: one dispatch and one host sync per engine step
                emits up to R*(k+1) tokens (a dispatch/sync costs
                ~1.3 ms each on a tunneled transport). tail_pos and the
                draft-cache lengths advance in-graph by each round's
                accepted count; the host re-syncs its copies from the
                returned accept counts."""

                def one_round(carry, r):
                    tok, dcaches, dlens, kt, vt, tpos = carry
                    drafts, dcaches = raw_scan(dparams, tok, dcaches,
                                               dlens)
                    tokens = jnp.concatenate([tok[:, None], drafts],
                                             axis=1)
                    out, acc, kt, vt = _spec(
                        params, tokens, k_pages, v_pages, kt, vt,
                        tables, paged_lens, tpos, bases, k_scales,
                        v_scales, temps, top_ps,
                        jax.random.fold_in(key, r))
                    nxt = jnp.take_along_axis(
                        out, acc[:, None], axis=1)[:, 0]
                    return (nxt, dcaches, dlens + acc + 1, kt, vt,
                            tpos + acc + 1), (out, acc)

                (_, dcaches, _, kt, vt, _), (outs, accs) = jax.lax.scan(
                    one_round,
                    (tok0, dcaches, dlens, k_tails, v_tails, tail_pos),
                    jnp.arange(n_rounds))
                return outs, accs, kt, vt, dcaches

            self._spec_draft_fn = jax.jit(
                _spec_draft, donate_argnums=(3, 7, 8))
        self._decode_chunk_fn = jax.jit(_decode_chunk,
                                        donate_argnums=(4, 5))
        self._prefill_fn = jax.jit(_prefill)
        self._prefill_chunk_fn = jax.jit(_prefill_chunk,
                                         donate_argnums=(2, 3))
        self._prefill_wchunk_fn = jax.jit(_prefill_wchunk,
                                          donate_argnums=(2, 3))

    # --- scheduling -------------------------------------------------------

    def submit(self, request: Request) -> int:
        if request.submit_ts is None:
            request.submit_ts = time.perf_counter()
        self.pending.append(request)
        return request.request_id

    def precompile_chunked_prefill(self, prompt_len: int,
                                   cached_tokens: int = 0) -> int:
        """Compile the grouped chunked-prefill program for every
        power-of-two group size up to max_batch at this prompt bucket
        (the vLLM-style shape-bucket warmup, adapted to XLA's
        shape-specialized executables).

        _step_prefill batches same-shape tasks into the largest pow2
        group, so the group size an open-loop arrival pattern produces
        depends on queue depth — any size in {1, 2, ..., max_batch} can
        occur, and the first occurrence of each pays a full Mosaic
        compile mid-serve (tens of seconds on a remote-compile
        transport), poisoning TTFT for everything queued behind it. A
        closed burst only ever exercises the largest group and g=1,
        which is why the gap never shows there. Returns the number of
        programs compiled. Windowed (sliding-window) prefill uses a
        different rolling-buffer program and is not covered here.

        `cached_tokens` (page-aligned) warms the prefix-cache SUFFIX
        shape: a cache hit of that many tokens turns the request into a
        task whose chunk derives from the suffix span — a different
        compile shape than the cold-prompt one (with monolithic prefill
        + prefix cache, the suffix task path is the only chunked path,
        so warm it or every new group size compiles mid-serve)."""
        if not (self.prefill_chunk
                or (self.prefix_cache and cached_tokens)):
            return 0
        if self.cfg.window is not None and self._wbuf is not None:
            # Windowed chunked prefill uses the fixed-width rolling-
            # buffer program (one compile shape for every prompt
            # length) — there is no bucket ladder to warm, and
            # allocating bucket-width [L, g, hkv, prompt_bucket, D]
            # buffers here OOMs at long prompts the windowed path
            # would never materialize.
            return 0
        tb = _bucket(prompt_len)
        span = tb - cached_tokens
        if span <= 0:
            return 0
        chunk = min(self.prefill_chunk or span, span)
        chunk = 1 << (chunk.bit_length() - 1)
        while span % chunk:
            chunk //= 2
        L = self.cfg.n_layers
        hkv, d = self.cfg.n_kv_heads, self.cfg.head_dim
        n = 0
        g = 1
        while g <= self.max_batch:
            toks = jnp.zeros((g, chunk), jnp.int32)
            if g == 1:
                kb = jnp.zeros((L, g, hkv, tb, d), self.cfg.dtype)
                vb = jnp.zeros((L, g, hkv, tb, d), self.cfg.dtype)
            else:
                # Warm the eager per-row -> group concatenate program
                # too: _step_prefill concatenates g single-row buffers
                # before every grouped dispatch, and its first run at a
                # new g is a mid-serve compile like any other.
                rows = [jnp.zeros((L, 1, hkv, tb, d), self.cfg.dtype)
                        for _ in range(g)]
                kb = jnp.concatenate(rows, axis=1)
                vb = jnp.concatenate(rows, axis=1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding
                sh = NamedSharding(self.mesh, self._buf_spec)
                kb = jax.device_put(kb, sh)
                vb = jax.device_put(vb, sh)
            logits, kb2, vb2 = self._prefill_chunk_fn(
                self.params, toks, kb, vb,
                jnp.zeros((g,), jnp.int32),
                jnp.full((g,), chunk, jnp.int32))
            for i in range(g if g > 1 else 0):
                # Warm the per-row re-slice programs (static start
                # indices -> one program per (g, i)).
                _ = kb2[:, i:i + 1], vb2[:, i:i + 1]
            if g > 1:
                # Group-finish batched first-token sampling: one
                # greedy program per finishing-group size m. Warm the
                # logits-slice concatenate + argmax shapes.
                lg = jnp.concatenate(
                    [logits[i:i + 1] for i in range(g)])
                self._sample_batch(lg, np.zeros(g, np.float32),
                                   np.zeros(g, np.float32))
                # Warm the temp>0 sampling program too (top-p sort +
                # categorical at [g, vocab]) — a mixed-temperature
                # finishing group otherwise compiles it mid-serve.
                self._sample_batch(lg, np.full(g, 0.5, np.float32),
                                   np.zeros(g, np.float32))
            _hard_sync(logits)
            n += 1
            g *= 2
        return n

    def precompile_decode(self) -> int:
        """Warm the decode-path executable at EVERY page-table bucket
        width (8, 64, max_pages): _step_decode buckets the table width
        by live pages, so a context growing past a bucket boundary
        (e.g. the 9th page) otherwise hits a cold Mosaic compile
        mid-serve — the same TTFT poisoning precompile_chunked_prefill
        exists to prevent. Warms whichever decode program this engine
        is configured to use (plain, fused-chunk, or speculative
        verify). Call while the engine is idle: the dummy dispatch
        writes garbage into tail position 0 of every slot, which is
        harmless only because a fresh sequence always rewrites its tail
        span before reading it. Returns the number of programs built."""
        B = self.max_batch
        widths = sorted({w for w in (8, 64, self.max_pages)
                         if w <= self.max_pages})
        zl = jnp.zeros((B,), jnp.int32)
        temps = jnp.zeros((B,), jnp.float32)
        top_ps = jnp.zeros((B,), jnp.float32)
        n = 0
        for w in widths:
            tables = jnp.zeros((B, w), jnp.int32)
            if self.speculative_k and self.draft_params is not None:
                (out, _, self.cache.k_tails, self.cache.v_tails,
                 self._draft_caches) = self._spec_draft_fn(
                    self.params, self.draft_params, zl,
                    self._draft_caches, zl, self.cache.k_pools,
                    self.cache.v_pools, self.cache.k_tails,
                    self.cache.v_tails, tables, zl, zl, zl,
                    self.cache.k_scale_pools,
                    self.cache.v_scale_pools, temps, top_ps,
                    self._next_key())
            elif self.speculative_k:
                toks = jnp.zeros((B, self.speculative_k + 1), jnp.int32)
                out, _, self.cache.k_tails, self.cache.v_tails = \
                    self._spec_fn(
                        self.params, toks, self.cache.k_pools,
                        self.cache.v_pools, self.cache.k_tails,
                        self.cache.v_tails, tables, zl, zl, zl,
                        self.cache.k_scale_pools,
                        self.cache.v_scale_pools, temps, top_ps,
                        self._next_key())
            elif self.decode_chunk > 1:
                out, self.cache.k_tails, self.cache.v_tails = \
                    self._decode_chunk_fn(
                        self.params, zl, self.cache.k_pools,
                        self.cache.v_pools, self.cache.k_tails,
                        self.cache.v_tails, tables, zl, zl, zl,
                        self.cache.k_scale_pools,
                        self.cache.v_scale_pools, temps, top_ps,
                        self._next_key())
            else:
                out, self.cache.k_tails, self.cache.v_tails = \
                    self._decode_fn(
                        self.params, zl, self.cache.k_pools,
                        self.cache.v_pools, self.cache.k_tails,
                        self.cache.v_tails, tables, zl, zl, zl,
                        self.cache.k_scale_pools,
                        self.cache.v_scale_pools)
                self._sample_batch(out, np.zeros(B, np.float32),
                                   np.zeros(B, np.float32))
            _hard_sync(out)
            n += 1
        return n

    def probe_prefix(self, prompt) -> int:
        """How many PROMPT TOKENS the prefix cache would serve for this
        prompt right now (pages are matched then immediately released —
        no state change). Lets harnesses warm the exact suffix compile
        shape the engine will dispatch instead of re-deriving the
        allocator's page rounding."""
        if not self.prefix_cache:
            return 0
        pages, _ = self.cache.match_prefix(np.asarray(prompt, np.int32))
        if pages:
            self.cache.release_pages(pages)
        return len(pages) * self.cache.page_size

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def _reserved_pages(self) -> int:
        """Pages still owed to live sequences under worst-case growth:
        each slot's growth budget (worst_pages, which for forked
        branches already excludes the shared prompt pages) minus the
        growth it has already materialized. In-flight chunked prefills
        hold their FULL reservation (their pages are not allocated until
        the final chunk lands). Sliding-window slots account LIVE pages
        (eviction keeps them bounded at the worst_pages peak)."""
        owed = sum(t.need_pages for t in self.prefilling)
        for s in self.slots:
            if s is None:
                continue
            if self.cfg.window is not None:
                live = (self.cache.pages_for(
                    max(self.cache.length(s.seq_id), 1))
                    - self.cache.allocator.base(s.seq_id))
                owed += max(0, s.worst_pages - live)
                continue
            grown = (self.cache.pages_for(
                max(self.cache.length(s.seq_id), 1))
                - self.cache.pages_for(max(s.prompt_len, 1)))
            budget = s.worst_pages - (
                self.cache.pages_for(max(s.prompt_len, 1))
                if s.branch == 0 else 0)
            owed += max(0, budget - grown)
        return owed

    def _promised_slots(self) -> int:
        """Decode slots owed to in-flight chunked prefills."""
        return sum(max(1, t.request.n) for t in self.prefilling)

    def _try_admit(self) -> list[Completion]:
        """FIFO admission into free slots, reserving worst-case pages.
        A request with n>1 prefills ONCE and forks the sequence n-1
        times — branches share every prompt page (refcounted; data
        copy-on-writes at the first shared-page flush)."""
        done = []
        # One usable-page budget: the scratch page ispermanently reserved.
        total_usable = self.cache.num_pages - 1
        while self.pending:
            req = self.pending[0]
            n = max(1, req.n)
            prompt = np.asarray(req.prompt, np.int32)
            t = len(prompt)
            win = self.cfg.window
            if win is not None and self._wbuf is not None:
                # Sliding-window chunked prefill: the install pages in
                # only ~window tokens and eviction bounds live pages to
                # ~window (+ a page of alignment + an unflushed tail)
                # regardless of context length — so the context-length
                # feasibility check drops entirely (O(window) admission
                # for arbitrarily long prompts). Monolithic windowed
                # prefill (else-branch) still pages the whole prompt at
                # install, so it keeps the O(t) reservation; eviction
                # reclaims after the fact.
                peak = min(t + req.max_new_tokens,
                           win + self.cache.page_size
                           + self.cache.tail_size)
                worst = self.cache.pages_for(peak)
                branch_worst = worst + 1
                too_long = False
            else:
                worst = self.cache.pages_for(t + req.max_new_tokens)
                branch_worst = \
                    (worst - self.cache.pages_for(max(t, 1))) + 1
                too_long = t + req.max_new_tokens > self.max_seq_len
            need = worst + (n - 1) * branch_worst
            # Infeasible requests are REJECTED as failed *completions*
            # (finish_reason="rejected"), never raised: an exception out
            # of step() would lose every completion run() had already
            # collected and leave the engine mid-flight. Fail the
            # request, keep the server.
            if too_long or n > self.max_batch or need > total_usable:
                self.pending.popleft()
                reason = (
                    f"infeasible for this engine: prompt {t} + max_new "
                    f"{req.max_new_tokens} (max_seq_len "
                    f"{self.max_seq_len}), n={n} (max_batch "
                    f"{self.max_batch}), worst-case pages {need} "
                    f"(usable {total_usable})")
                self.stats.rejected += 1
                done.append(Completion(
                    request_id=req.request_id, prompt_len=t, tokens=[],
                    finish_reason="rejected", error=reason))
                continue
            # Prefix-cache probe (pages acquired; released on any
            # admission failure below). Feasibility above deliberately
            # ignored the discount: a request must fit a COLD cache.
            cached = []
            if self.prefix_cache:
                cached, _ = self.cache.match_prefix(prompt)
                if win is not None and self._wbuf is not None:
                    # Windowed: cached pages only seed the rolling
                    # prefill buffer (no page sharing at install —
                    # below-window pages evict anyway); cap at the
                    # buffer's page capacity and release the excess.
                    mcap = min(len(cached),
                               self._wbuf // self.cache.page_size)
                    if mcap < len(cached):
                        self.cache.release_pages(cached[mcap:])
                        cached = cached[:mcap]
            m = len(cached)
            if not (win is not None and self._wbuf is not None):
                need -= m

            free_slots = [i for i, s in enumerate(self.slots)
                          if s is None]
            # Rolling-buffer HBM budget: windowed chunked prefill holds
            # ~_wbuf_task_bytes per in-flight task until install; slots
            # alone don't bound that commitment at large max_batch.
            wbuf_over = False
            if (win is not None and self._wbuf is not None
                    and self._prefill_hbm_budget is not None
                    and (self.prefill_chunk is not None or m)):
                inflight = sum(1 for p in self.prefilling if p.windowed)
                wbuf_over = (inflight > 0 and
                             (inflight + 1) * self._wbuf_task_bytes
                             > self._prefill_hbm_budget)
            if (len(free_slots) - self._promised_slots() < n
                    or self.cache.free_pages - self._reserved_pages()
                    < need or wbuf_over):
                if cached:
                    self.cache.release_pages(cached)
                break                       # wait for slots/pages/HBM
            self.pending.popleft()

            if self._wbuf is not None and (
                    self.prefill_chunk is not None or m):
                # Sliding-window chunked prefill: fixed-width rolling
                # buffer, every prompt length shares ONE compile shape.
                wb = self._wbuf
                shape = (self.cfg.n_layers, 1, self.cfg.n_kv_heads,
                         wb, self.cfg.head_dim)
                if m:
                    kg, vg = self.cache.gather_pages(
                        cached, m * self.cache.page_size)
                    pad = wb - m * self.cache.page_size
                    zpad = jnp.zeros(shape[:3] + (pad, shape[4]),
                                     self.cfg.dtype)
                    kb = jnp.concatenate([zpad, kg], axis=3)
                    vb = jnp.concatenate([zpad, vg], axis=3)
                    self.stats.prefix_cached_tokens += \
                        m * self.cache.page_size
                else:
                    kb = jnp.zeros(shape, self.cfg.dtype)
                    vb = jnp.zeros(shape, self.cfg.dtype)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding
                    sh = NamedSharding(self.mesh, self._buf_spec)
                    kb = jax.device_put(kb, sh)
                    vb = jax.device_put(vb, sh)
                self.prefilling.append(_PrefillTask(
                    request=req, prompt=prompt, bucket=wb,
                    chunk=self._wchunk,
                    done=m * self.cache.page_size,
                    padded_done=m * self.cache.page_size,
                    k_bufs=kb, v_bufs=vb, logits=None,
                    need_pages=need, worst=worst,
                    branch_worst=branch_worst, windowed=True,
                    prefix_pages=tuple(cached)))
                continue

            if self.prefill_chunk is not None or m:
                tb = _bucket(t)
                if m:
                    kb, vb = self.cache.gather_pages(cached, tb)
                    self.stats.prefix_cached_tokens += \
                        m * self.cache.page_size
                else:
                    shape = (self.cfg.n_layers, 1, self.cfg.n_kv_heads,
                             tb, self.cfg.head_dim)
                    kb = jnp.zeros(shape, self.cfg.dtype)
                    vb = jnp.zeros(shape, self.cfg.dtype)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding
                    sh = NamedSharding(self.mesh, self._buf_spec)
                    kb = jax.device_put(kb, sh)
                    vb = jax.device_put(vb, sh)
                # Chunk-size invariant: every dispatch writes `chunk`
                # rows at offset `done` via dynamic_update_slice, which
                # CLAMPS an out-of-range start (silently corrupting
                # earlier KV). Starts are m*page_size + k*chunk, so a
                # power-of-two chunk dividing the suffix span makes
                # every start + chunk <= bucket exactly.
                span = tb - m * self.cache.page_size
                chunk = min(self.prefill_chunk or span, span)
                chunk = 1 << (chunk.bit_length() - 1)
                while span % chunk:
                    chunk //= 2
                self.prefilling.append(_PrefillTask(
                    request=req, prompt=prompt, bucket=tb,
                    chunk=chunk,
                    done=m * self.cache.page_size,
                    k_bufs=kb, v_bufs=vb,
                    logits=None, need_pages=need, worst=worst,
                    branch_worst=branch_worst,
                    prefix_pages=tuple(cached)))
                continue

            tb = _bucket(t)
            padded = np.zeros((1, tb), np.int32)
            padded[0, :t] = prompt
            t0 = time.perf_counter()
            logits, ks, vs = self._prefill_fn(
                self.params, jnp.asarray(padded), np.int32(t))
            _hard_sync(logits)
            self.stats.prefill_s += time.perf_counter() - t0
            done.extend(self._install_sequences(
                req, logits, ks[:, 0, :, :t], vs[:, 0, :, :t], t,
                worst, branch_worst, prompt=prompt))
        return done

    def _install_sequences(self, req, logits, ks, vs, t, worst,
                           branch_worst, prefix_pages=(),
                           prompt=None, base_tokens=0,
                           first_token: int | None = None,
                           ) -> list[Completion]:
        """Prompt KV is ready: page it in (only the suffix past any
        cached prefix pages), fork n-1 branches, fill decode slots,
        sample + timestamp the first token (TTFT). `base_tokens` admits
        a sliding-window sequence whose below-window front is already
        evicted (ks/vs then hold positions [base_tokens, t))."""
        done = []
        n = max(1, req.n)
        free_slots = [i for i, s in enumerate(self.slots) if s is None]
        if prefix_pages:
            start = len(prefix_pages) * self.cache.page_size
            sid = self.cache.add_sequence_prefixed(
                list(prefix_pages), ks[:, :, start:], vs[:, :, start:], t)
        else:
            sid = self.cache.add_sequence(ks, vs,
                                          base_tokens=base_tokens)
        if self.prefix_cache and prompt is not None and not base_tokens:
            self.cache.register_prefix(sid, np.asarray(prompt)[:t])
        sids = [sid] + [self.cache.fork_sequence(sid)
                        for _ in range(n - 1)]
        self.stats.prefill_tokens += \
            t - len(prefix_pages) * self.cache.page_size
        ttft = (time.perf_counter() - req.submit_ts
                if req.submit_ts is not None else None)
        if ttft is not None:
            self.stats.ttft_s.append(ttft)

        installed = []
        for branch, (slot_idx, bsid) in enumerate(zip(free_slots, sids)):
            first = (first_token
                     if branch == 0 and first_token is not None
                     else self._sample_one(logits[0], req.temperature,
                                           req.top_p))
            slot = _Slot(request=req, seq_id=bsid, prompt_len=t,
                         length=t, tail=0, next_token=first,
                         generated=[first], branch=branch,
                         worst_pages=worst if branch == 0
                         else branch_worst, ttft_s=ttft)
            fin = self._maybe_finish(slot)
            if fin is not None:
                done.append(fin)
            else:
                self.slots[slot_idx] = slot
                installed.append(slot_idx)
        if self.draft_params is not None:
            self._draft_install_prompt(prompt, t, installed)
        return done

    def _draft_install_prompt(self, prompt, t, slot_idxs) -> None:
        """Prefill the DRAFT model's contiguous cache for freshly
        installed slots (one tiny-model dispatch; forked branches share
        the prompt KV by plain copy). Prompts beyond the draft cache
        leave the slot cold (_draft_len 0): drafts are then garbage,
        acceptance ~0, transcripts still exact — verification is the
        only authority."""
        k = self.speculative_k
        if prompt is None or t > self._draft_S - (k + 2):
            for i in slot_idxs:
                self._draft_len[i] = 0
            return
        if not slot_idxs:
            return
        tb = min(_bucket(t), self._draft_S)
        padded = np.zeros((1, tb), np.int32)
        padded[0, :t] = np.asarray(prompt, np.int32)[:t]
        ks, vs = self._draft_prefill_fn(
            self.draft_params, jnp.asarray(padded), np.int32(t))
        for i in slot_idxs:
            self._draft_caches = self._draft_install_fn(
                self._draft_caches, ks, vs, np.int32(i))
            self._draft_len[i] = t

    def _step_prefill(self) -> list[Completion]:
        """Advance prefill by up to `prefill_chunk` REAL tokens of
        dispatch latency this engine step; sequences whose final chunk
        lands install into decode slots immediately.

        Queued tasks sharing a (bucket, chunk) compile shape advance as
        ONE batched dispatch (largest power-of-two FIFO group, each row
        at its own prefix offset) — a dispatch costs the full weight
        read regardless of rows, so N similar queued prompts prefill in
        ~1/N the wall time of the old serial one-request-per-dispatch
        path (VERDICT r2 weak #1). The budget counts the group's widest
        row (its latency proxy), not the summed rows."""
        done = []
        # With chunked prefill off, tasks exist only via the prefix
        # cache (one dispatch each, chunk = suffix span) — drain them
        # all this step; monolithic mode has no interleaving contract.
        budget = self.prefill_chunk or float("inf")
        if not self.prefilling:
            budget = 0
        while self.prefilling and budget > 0:
            head = self.prefilling[0]
            key = (head.windowed, head.bucket, head.chunk)
            group = [t for t in self.prefilling
                     if (t.windowed, t.bucket, t.chunk) == key]
            g = 1 << (len(group).bit_length() - 1)  # pow2, no padding
            group = group[:g]
            c = head.chunk
            chunk = np.zeros((g, c), np.int32)
            starts = np.zeros(g, np.int32)
            reals = np.zeros(g, np.int32)
            for i, task in enumerate(group):
                t = len(task.prompt)
                starts[i] = task.done
                reals[i] = min(c, t - task.done)
                chunk[i, :reals[i]] = task.prompt[
                    task.done:task.done + reals[i]]
            if g == 1:
                kb, vb = head.k_bufs, head.v_bufs
            else:
                kb = jnp.concatenate([t.k_bufs for t in group], axis=1)
                vb = jnp.concatenate([t.v_bufs for t in group], axis=1)
            fn = (self._prefill_wchunk_fn if head.windowed
                  else self._prefill_chunk_fn)
            t0 = time.perf_counter()
            # No per-chunk readback: chunk dispatches pipeline on the
            # device (the host<->device sync costs tens of ms on
            # tunneled transports); the install step below blocks once
            # per sequence. prefill_s therefore times enqueue + the
            # final sync, attributing pipelined device time to the
            # completing chunk.
            logits, kb, vb = fn(
                self.params, jnp.asarray(chunk), kb, vb,
                jnp.asarray(starts), jnp.asarray(reals))
            if self._sync_debug:
                _hard_sync(logits)
            self.stats.prefill_s += time.perf_counter() - t0
            budget -= int(reals.max())
            fin = []
            for i, task in enumerate(group):
                task.logits = logits[i:i + 1]
                task.k_bufs = kb if g == 1 else kb[:, i:i + 1]
                task.v_bufs = vb if g == 1 else vb[:, i:i + 1]
                task.done = int(starts[i] + reals[i])
                task.padded_done = int(starts[i]) + c
                if task.done >= len(task.prompt):
                    self.prefilling.remove(task)
                    fin.append(task)
            single = [t_ for t_ in fin if max(1, t_.request.n) == 1]
            if len(single) > 1:
                # ONE batched first-token sample + ONE readback for the
                # whole finishing group. Per-task _sample_one serialized
                # g host<->device round-trips here, and those syncs —
                # not device compute — dominated open-loop TTFT
                # (serve-bench --trace). Greedy rows are argmax in both
                # paths, so transcripts are unchanged.
                m = len(single)
                # Pad to pow2. Invariant: mp never exceeds the largest
                # warmed group size — _step_prefill groups are clamped
                # to a power of two <= max_batch (g = pow2 floor of the
                # queue length), m <= g, and ceil_pow2(m) <= g since g
                # is itself a power of two; precompile warms every pow2
                # g <= max_batch (both greedy and temp>0 shapes).
                mp = 1 << (m - 1).bit_length()
                rows = [t_.logits for t_ in single]
                rows += [rows[0]] * (mp - m)
                temps = np.zeros(mp, np.float32)
                tps = np.zeros(mp, np.float32)
                temps[:m] = [t_.request.temperature for t_ in single]
                tps[:m] = [t_.request.top_p for t_ in single]
                toks = self._sample_batch(
                    jnp.concatenate(rows), temps, tps)
                for t_, tok in zip(single, toks[:m]):
                    t_.first_token = int(tok)
            for task in fin:
                if task.windowed:
                    done.extend(self._install_windowed(task))
                    continue
                t = len(task.prompt)
                done.extend(self._install_sequences(
                    task.request, task.logits,
                    task.k_bufs[:, 0, :, :t], task.v_bufs[:, 0, :, :t],
                    t, task.worst, task.branch_worst,
                    prefix_pages=task.prefix_pages, prompt=task.prompt,
                    first_token=task.first_token))
        return done

    def _install_windowed(self, task: _PrefillTask) -> list[Completion]:
        """Windowed-prefill install: page in only the last `stored`
        tokens (positions >= the page-aligned eviction base — older
        positions can never be attended again), admitting the sequence
        with that base. Cached seed pages were compute-only; release
        their refs."""
        t = len(task.prompt)
        win = self.cfg.window
        ps = self.cache.page_size
        base = max(0, ((t - win) // ps) * ps)
        # Buffer cols: absolute position p sits at p - padded_done + wb.
        off = task.bucket - task.padded_done
        ks = task.k_bufs[:, 0, :, base + off: t + off]
        vs = task.v_bufs[:, 0, :, base + off: t + off]
        if task.prefix_pages:
            self.cache.release_pages(task.prefix_pages)
        out = self._install_sequences(
            task.request, task.logits, ks, vs, t,
            task.worst, task.branch_worst, prompt=task.prompt,
            base_tokens=base, first_token=task.first_token)
        # Cached-seed tokens were never prefilled (install counts the
        # full prompt; correct the split back to cached vs computed).
        self.stats.prefill_tokens -= min(
            len(task.prefix_pages) * ps, t)
        return out

    def _maybe_finish(self, slot: _Slot,
                      slot_idx: int | None = None) -> Completion | None:
        req = slot.request
        last = slot.generated[-1]
        if req.eos_id is not None and last == req.eos_id:
            reason = "stop"
        elif len(slot.generated) >= req.max_new_tokens:
            reason = "length"
        else:
            return None
        if self.prefix_cache:
            # Register full pages covering the prompt + generated
            # tokens whose KV was fed (the last sampled token never
            # was), so multi-turn prompts extending this transcript
            # hit the cache. Unflushed tail tokens that would complete
            # a new full page are flushed first (finish-time only, and
            # only when it wins at least one cacheable page).
            fed = np.concatenate([
                np.asarray(slot.request.prompt, np.int32),
                np.asarray(slot.generated[:-1], np.int32)])
            paged = max(self.cache.length(slot.seq_id), 0)
            ps = self.cache.page_size
            if (slot_idx is not None and slot.tail
                    and (paged + slot.tail) // ps > paged // ps):
                counts = [0] * self.max_batch
                counts[slot_idx] = slot.tail
                self.cache.flush_tails(
                    [s.seq_id if s else -1 for s in self.slots], counts)
                slot.tail = 0
                paged = max(self.cache.length(slot.seq_id), 0)
            usable = min(len(fed), paged)
            n_full = usable // ps
            if n_full:
                self.cache.register_prefix(
                    slot.seq_id, fed[:n_full * ps])
        self.cache.free_sequence(slot.seq_id)
        return Completion(
            request_id=req.request_id, prompt_len=slot.prompt_len,
            tokens=list(slot.generated), finish_reason=reason,
            branch=slot.branch, ttft_s=slot.ttft_s,
        )

    # --- sampling ---------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _sample_one(self, logits, temperature: float,
                    top_p: float = 0.0) -> int:
        from flash_attention_tpu.models.sampling import sample

        return int(sample(logits[None], self._next_key(),
                          temperature=temperature, top_p=top_p)[0])

    def _sample_batch(self, logits, temps: np.ndarray,
                      top_ps: np.ndarray) -> np.ndarray:
        """Per-slot temperature + nucleus: greedy where temp<=0."""
        from flash_attention_tpu.models.sampling import apply_top_p

        greedy = jnp.argmax(logits, axis=-1)
        if (temps <= 0.0).all():
            return np.asarray(greedy, np.int32)
        t = jnp.asarray(np.maximum(temps, 1e-6))[:, None]
        scaled = apply_top_p(logits / t, jnp.asarray(top_ps))
        cat = jax.random.categorical(self._next_key(), scaled, axis=-1)
        return np.asarray(
            jnp.where(jnp.asarray(temps) <= 0.0, greedy, cat), np.int32)

    # --- engine step ------------------------------------------------------

    def _trace_step(self, t0: float, kind: str) -> None:
        if self.trace is not None:
            self.trace.append(
                (t0, time.perf_counter() - t0, kind, self.num_active,
                 len(self.pending), len(self.prefilling)))

    def step(self) -> list[Completion]:
        """One engine iteration: admit, advance one prefill chunk (when
        chunked prefill is on), one fused decode dispatch of
        `decode_chunk` steps, collect finished sequences. Returns
        completions finished this step."""
        t_step = time.perf_counter()
        done = self._try_admit()
        self.stats.admit_s += time.perf_counter() - t_step
        used = self.cache.num_pages - self.cache.free_pages
        if used > self.stats.peak_pages:
            # Peak page occupancy: the windowed-serving O(window) claim
            # is checked against this (a 64K/4K-window sequence must
            # hold ~window pages, not ~context — see SERVING.md).
            self.stats.peak_pages = used
        done.extend(self._step_prefill())
        live = [i for i, s in enumerate(self.slots) if s is not None]
        # Prefill-priority batching with a BOUNDED decode stall: a
        # decode dispatch costs the full weight read regardless of slot
        # occupancy, so while prompts are mid-prefill and the batch is
        # not yet nearly full, prefer prefilling (each step bounded to
        # the chunk budget) over under-occupied decode dispatches —
        # synchronized finish waves would otherwise oscillate the batch
        # at half occupancy and double the per-token decode cost. But
        # the preference is a LEASE, not a gate: after
        # `max_decode_stall` consecutive prefill-only steps a decode
        # dispatch runs regardless of occupancy, so a live sequence's
        # inter-token latency is bounded by max_decode_stall chunk
        # times even under a continuous arrival stream (round 2 stalled
        # decode indefinitely while the batch filled).
        near_full = self.max_batch - max(1, self.max_batch // 8)
        if (self.prefilling and len(live) < near_full
                and self._decode_stalled < self.max_decode_stall):
            self._decode_stalled += 1
            self.stats.engine_steps += 1
            self._trace_step(t_step, "prefill-lease")
            return done
        self._decode_stalled = 0
        if not live:
            self.stats.engine_steps += 1
            self._trace_step(t_step, "idle" if not self.prefilling
                             else "prefill-only")
            return done

        chunk = self.decode_chunk
        step_tokens = (
            (self.speculative_k + 1) * self.speculative_rounds
            if self.speculative_k else chunk)
        t_flush = time.perf_counter()
        # Flush BEFORE the chunk if any live tail could overflow.
        if any(self.slots[i].tail + step_tokens > self.cache.tail_size
               for i in live):
            self.cache.flush_tails(
                [s.seq_id if s else -1 for s in self.slots],
                [s.tail if s else 0 for s in self.slots])
            for s in self.slots:
                if s is not None:
                    s.tail = 0
            if self.cfg.window is not None:
                # Sliding-window reclamation: pages entirely below the
                # next query's window start can never be read again.
                for i in live:
                    sid = self.slots[i].seq_id
                    self.cache.evict_below(
                        sid,
                        self.cache.length(sid) + 1 - self.cfg.window)

        if self._sync_debug:
            _hard_sync(self.cache.k_tails)
        self.stats.flush_s += time.perf_counter() - t_flush

        t_book = time.perf_counter()
        tokens = np.zeros(self.max_batch, np.int32)
        tail_pos = np.zeros(self.max_batch, np.int32)
        temps = np.zeros(self.max_batch, np.float32)
        top_ps = np.zeros(self.max_batch, np.float32)
        for i in live:
            tokens[i] = self.slots[i].next_token
            tail_pos[i] = self.slots[i].tail
            temps[i] = self.slots[i].request.temperature
            top_ps[i] = self.slots[i].request.top_p
        slot_sids = [s.seq_id if s else -1 for s in self.slots]
        # Shape-bucketed page-table width: the paged kernel runs a
        # (B, width) grid per layer, so the full engine max_pages
        # (512 at the 128K default max_seq_len) costs ~20 ms/step of
        # masked grid traversal at short contexts. Coarse pow8 buckets
        # bound the number of compiled decode programs to 3-4.
        need = self.cache.live_pages(slot_sids)
        width = self.max_pages
        for b_ in (8, 64):
            if need <= b_ <= self.max_pages:
                width = b_
                break
        tables, paged_lens = self.cache.batch_state(slot_sids, width)
        bases = self.cache.bases(slot_sids)
        self.stats.book_s += time.perf_counter() - t_book

        if self.speculative_k:
            out = self._step_speculative(done, live, tail_pos, temps,
                                         top_ps, tables, paged_lens,
                                         bases)
            self._trace_step(t_step, "decode-spec")
            return out

        t0 = time.perf_counter()
        if chunk == 1:
            logits, self.cache.k_tails, self.cache.v_tails = \
                self._decode_fn(
                    self.params, jnp.asarray(tokens),
                    self.cache.k_pools, self.cache.v_pools,
                    self.cache.k_tails, self.cache.v_tails,
                    tables, paged_lens, jnp.asarray(tail_pos), bases,
                    self.cache.k_scale_pools, self.cache.v_scale_pools,
                )
            toks = self._sample_batch(logits, temps, top_ps)[None, :]
        else:
            toks_dev, self.cache.k_tails, self.cache.v_tails = \
                self._decode_chunk_fn(
                    self.params, jnp.asarray(tokens),
                    self.cache.k_pools, self.cache.v_pools,
                    self.cache.k_tails, self.cache.v_tails,
                    tables, paged_lens, jnp.asarray(tail_pos), bases,
                    self.cache.k_scale_pools, self.cache.v_scale_pools,
                    jnp.asarray(temps), jnp.asarray(top_ps),
                    self._next_key(),
                )
            toks = np.asarray(toks_dev)              # [chunk, B], one sync
        self.stats.decode_s += time.perf_counter() - t0
        self.stats.engine_steps += 1

        accepted = 0
        for i in live:
            s = self.slots[i]
            # All chunk tokens are in the cache (tail); accept into the
            # transcript until eos/max_new — the rest is dead compute.
            s.length += toks.shape[0]
            s.tail += toks.shape[0]
            for step_row in toks:
                if s is None:
                    break
                tok = int(step_row[i])
                s.next_token = tok
                s.generated.append(tok)
                accepted += 1
                fin = self._maybe_finish(s, slot_idx=i)
                if fin is not None:
                    done.append(fin)
                    self.slots[i] = None
                    s = None
        self.stats.decode_tokens += accepted
        self._trace_step(t_step, "decode")
        return done

    def _step_speculative(self, done, live, tail_pos, temps, top_ps,
                          tables, paged_lens, bases) -> list[Completion]:
        """One speculative decode step: [next_token, k drafts] per live
        slot through one multi-token dispatch; the rejection-sampling
        acceptance (greedy rows: argmax equality) runs on device and
        provably preserves each row's sampling law."""
        k = self.speculative_k
        tokens = np.zeros((self.max_batch, k + 1), np.int32)
        for i in live:
            tokens[i, 0] = self.slots[i].next_token
        t0 = time.perf_counter()
        if self.draft_params is not None:
            # Draft scan + verify fused into ONE dispatch; the drafts
            # never touch the host.
            (out_dev, acc_dev, self.cache.k_tails, self.cache.v_tails,
             self._draft_caches) = self._spec_draft_fn(
                self.params, self.draft_params,
                jnp.asarray(tokens[:, 0]), self._draft_caches,
                jnp.asarray(self._draft_len, jnp.int32),
                self.cache.k_pools, self.cache.v_pools,
                self.cache.k_tails, self.cache.v_tails,
                tables, paged_lens, jnp.asarray(tail_pos), bases,
                self.cache.k_scale_pools, self.cache.v_scale_pools,
                jnp.asarray(temps), jnp.asarray(top_ps),
                self._next_key(),
            )
        else:
            for i in live:
                s = self.slots[i]
                hist = np.concatenate([
                    np.asarray(s.request.prompt, np.int32),
                    np.asarray(s.generated, np.int32)])
                tokens[i, 1:] = (
                    self.draft_fn(hist, k,
                                  request_id=s.request.request_id)
                    if self._draft_takes_id else self.draft_fn(hist, k))
            out_dev, acc_dev, self.cache.k_tails, self.cache.v_tails = \
                self._spec_fn(
                    self.params, jnp.asarray(tokens),
                    self.cache.k_pools, self.cache.v_pools,
                    self.cache.k_tails, self.cache.v_tails,
                    tables, paged_lens, jnp.asarray(tail_pos), bases,
                    self.cache.k_scale_pools, self.cache.v_scale_pools,
                    jnp.asarray(temps), jnp.asarray(top_ps),
                    self._next_key(),
                )
        out = np.asarray(out_dev)                    # one sync
        acc = np.asarray(acc_dev)
        self.stats.decode_s += time.perf_counter() - t0
        self.stats.engine_steps += 1
        if self.draft_params is None:
            out, acc = out[None], acc[None]          # [R=1, B, k+1]/[1, B]

        accepted_total = 0
        for r in range(out.shape[0]):
            for i in live:
                s = self.slots[i]
                if s is None:
                    continue                        # finished at round < r
                a = int(acc[r, i])
                # KV for positions 0..k was written; only 0..a is real.
                self.stats.spec_proposed += k
                self.stats.spec_accepted += a
                if self.draft_params is not None:
                    # Draft cache: positions len..len+a confirmed (the
                    # rejected rows above are overwritten by the next
                    # scan before they are unmasked).
                    self._draft_len[i] = min(
                        int(self._draft_len[i]) + a + 1,
                        self._draft_S - 1)
                s.length += a + 1
                s.tail += a + 1
                for tok in out[r, i, : a + 1]:
                    if s is None:
                        break
                    s.next_token = int(tok)
                    s.generated.append(int(tok))
                    accepted_total += 1
                    fin = self._maybe_finish(s, slot_idx=i)
                    if fin is not None:
                        done.append(fin)
                        self.slots[i] = None
                        s = None
        self.stats.decode_tokens += accepted_total
        return done

    def run(self, requests=None) -> list[Completion]:
        """Serve until every pending/submitted request completes."""
        for r in requests or []:
            self.submit(r)
        out = []
        while self.pending or self.prefilling or self.num_active:
            out.extend(self.step())
        return sorted(out, key=lambda c: (c.request_id, c.branch))
