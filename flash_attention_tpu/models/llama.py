"""Llama-class decoder-only transformer on the flash-attention ops.

Flagship model family (north-star configs 4-5 reference Llama-3-8B/70B
decode, BASELINE.json). Pure-JAX pytrees — no framework dependency — so
pjit sharding is explicit and the whole train/decode step stays a single
XLA program.

Architecture: RMSNorm -> GQA attention (RoPE q/k) -> residual ->
RMSNorm -> SwiGLU MLP -> residual; untied output head. Attention runs
the Pallas flash kernel (causal, GQA) in training/prefill and
flash_decode / paged_flash_decode at inference.

Sharding rules (param_shardings): tp shards heads/ffn, fsdp shards the
remaining leading dim — the standard 2D layout where tp collectives
ride the innermost (fastest ICI) mesh axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from flash_attention_tpu.ops.flash import flash_attention
from flash_attention_tpu.ops.decode import flash_decode


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    # Sliding-window attention (Mistral/Gemma local pattern): every
    # layer attends only the most recent `window` positions. None =
    # full causal attention.
    window: int | None = None
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    # --- presets -------------------------------------------------------

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Test-scale config."""
        base = dict(
            vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=512)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_1b(**kw) -> "LlamaConfig":
        """1B-class serving workhorse. Diverges from Llama-3.2-1B in one
        deliberate way: 16 heads of dim 128 instead of 32 of dim 64 —
        a 64-wide head pads every (8,128) HBM tile of the KV pools to
        half occupancy on TPU (2x cache memory and bandwidth); 128 is
        the native lane width. Same param count and kv-head count."""
        base = dict(
            vocab_size=128256, dim=2048, n_layers=16, n_heads=16,
            n_kv_heads=8, ffn_dim=8192)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_8b(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def mistral_7b(**kw) -> "LlamaConfig":
        """Mistral-7B-class shapes with the 4096-token sliding window."""
        base = dict(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336, rope_theta=10000.0,
            window=4096)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_70b(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=128256, dim=8192, n_layers=80, n_heads=64,
            n_kv_heads=8, ffn_dim=28672)
        base.update(kw)
        return LlamaConfig(**base)


# --- parameters ---------------------------------------------------------


def init_params(cfg: LlamaConfig, key) -> dict:
    """He-style init, params stored in cfg.dtype (master weights in a
    real run would be fp32 via optax; kept simple here)."""
    d, hd = cfg.dim, cfg.head_dim
    keys = jax.random.split(key, 4 + cfg.n_layers)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) /
                np.sqrt(fan_in)).astype(cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 7)
        layers.append({
            "attn_norm": jnp.ones((d,), cfg.dtype),
            "wq": dense(lk[0], (d, cfg.n_heads, hd), d),
            "wk": dense(lk[1], (d, cfg.n_kv_heads, hd), d),
            "wv": dense(lk[2], (d, cfg.n_kv_heads, hd), d),
            "wo": dense(lk[3], (cfg.n_heads, hd, d), cfg.n_heads * hd),
            "mlp_norm": jnp.ones((d,), cfg.dtype),
            "w_gate": dense(lk[4], (d, cfg.ffn_dim), d),
            "w_up": dense(lk[5], (d, cfg.ffn_dim), d),
            "w_down": dense(lk[6], (cfg.ffn_dim, d), cfg.ffn_dim),
        })
    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": dense(keys[1], (d, cfg.vocab_size), d),
    }


def serving_param_shardings(cfg: LlamaConfig, tp_size: int) -> dict:
    """PartitionSpecs for TP serving (Engine under a mesh): the Megatron
    column/row split where each decode matmul is local to a shard and
    exactly one psum per block stitches the residual stream back
    together — attention qkv/wo split over heads (tp must divide
    n_kv_heads so each shard owns whole KV-head groups and its slice of
    the paged pools), mlp gate/up/down over ffn, lm_head over vocab
    (logits all-gather at the end). Embeddings/norms replicate: serving
    batches are small and the embed row gather per step is cheap."""
    if cfg.n_kv_heads % tp_size:
        raise ValueError(
            f"tp={tp_size} must divide n_kv_heads={cfg.n_kv_heads}")
    layer = {
        "attn_norm": P(),
        "wq": P(None, "tp", None),
        "wk": P(None, "tp", None),
        "wv": P(None, "tp", None),
        "wo": P("tp", None, None),
        "mlp_norm": P(),
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    n_experts = getattr(cfg, "n_experts", 0)
    if n_experts:
        # MoE layer: experts shard their leading E dim over tp (the
        # router replicates; moe_mlp's expert_shard_axis path slices
        # the dispatch cube per rank and psums the combine).
        if n_experts % tp_size:
            raise ValueError(
                f"tp={tp_size} must divide n_experts={n_experts}")
        layer = {**layer, "router": P(),
                 "w_gate": P("tp"), "w_up": P("tp"), "w_down": P("tp")}
    return {
        "embed": P(),
        "layers": [layer] * cfg.n_layers,
        "final_norm": P(),
        "lm_head": P(None, "tp"),
    }


def param_shardings(cfg: LlamaConfig, tp_size: int | None = None) -> dict:
    """PartitionSpecs: tp over heads/ffn, fsdp over the other big dim.

    When tp does not divide n_kv_heads (GQA with few KV heads on a wide
    tp axis), KV projections replicate their head dim — the standard
    fallback; a head-group-aware split is a future refinement."""
    kv_tp = "tp" if (tp_size is None or cfg.n_kv_heads % tp_size == 0) \
        else None
    layer = {
        "attn_norm": P(),
        "wq": P("fsdp", "tp", None),
        "wk": P("fsdp", kv_tp, None),
        "wv": P("fsdp", kv_tp, None),
        "wo": P("tp", None, "fsdp"),
        "mlp_norm": P(),
        "w_gate": P("fsdp", "tp"),
        "w_up": P("fsdp", "tp"),
        "w_down": P("tp", "fsdp"),
    }
    return {
        "embed": P("tp", "fsdp"),
        "layers": [layer] * cfg.n_layers,
        "final_norm": P(),
        "lm_head": P("fsdp", "tp"),
    }


# --- building blocks -----------------------------------------------------


def _mm(spec, x, w):
    """Weight einsum with int8 weight-only dispatch: a QuantizedWeight
    (models/quantized.py) runs the fused-dequant Pallas matmul for
    skinny shapes; dense weights run plain einsum — or, with
    FA_TPU_DENSE_PALLAS_MM=1, the explicit weight-streaming Pallas
    matmul for skinny activations (the small-dispatch prefill cliff
    experiment, scripts/probe_prefill_cliff.py: XLA's own skinny-m
    dense lowering can run far under HBM speed)."""
    import os

    from flash_attention_tpu.models.quantized import (
        Int4Weight, QuantizedWeight, _weight_einsum,
    )

    if isinstance(w, (QuantizedWeight, Int4Weight)):
        return w.einsum(spec, x)
    if os.environ.get("FA_TPU_DENSE_PALLAS_MM") and w.ndim >= 2:
        return _weight_einsum(_DensePallasWeight(w, spec), spec, x)
    return jnp.einsum(spec, x, w)


class _DensePallasWeight:
    """Adapter giving a dense weight the quantized-weight einsum
    protocol (orig_shape / n_contract / _matmul2d) so _weight_einsum's
    2D normalization is reused; skinny activations stream through the
    blocked Pallas matmul, fat ones stay on XLA."""

    def __init__(self, w, spec):
        ins, _ = spec.split("->")
        xs, ws = ins.split(",")
        self.orig_shape = tuple(w.shape)
        self.n_contract = sum(1 for c in ws if c in xs)
        k = int(np.prod(w.shape[: self.n_contract]) or 1)
        self._w2 = w.reshape(k, -1)

    def _matmul2d(self, x2):
        from flash_attention_tpu.ops.quant_matmul import dense_matmul

        if x2.shape[0] <= 1024:
            return dense_matmul(x2, self._w2)
        return jnp.dot(x2, self._w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_reduce(x, axis_name):
    return jax.lax.psum(x, axis_name)


def _psum_reduce_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_reduce_bwd(axis_name, _, ct):
    # Megatron "reduce_from_region": the reduced output is identical
    # on every shard, so each shard's local branch receives the
    # cotangent unchanged. (The default psum transpose under
    # check_vma=False would psum again — an axis-size scaling bug.)
    return (ct,)


_psum_reduce.defvjp(_psum_reduce_fwd, _psum_reduce_bwd)


def _psum(x, axis_name):
    """Row-parallel reduction: identity outside shard_map (axis None);
    differentiation-safe (fwd psum, bwd identity) inside."""
    return x if axis_name is None else _psum_reduce(x, axis_name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tp_copy(x, axis_name):
    return x


def _tp_copy_fwd(x, axis_name):
    return x, None


def _tp_copy_bwd(axis_name, _, ct):
    # Megatron "copy_to_region": a replicated activation consumed by
    # every shard's local matmuls accumulates its TRUE cotangent as the
    # sum of the per-shard partials.
    return (jax.lax.psum(ct, axis_name),)


_tp_copy.defvjp(_tp_copy_fwd, _tp_copy_bwd)


def tp_copy(x, axis_name):
    """Identity forward; backward all-reduces over `axis_name`. Place
    where a replicated activation enters a tensor-parallel region so
    VJPs inside shard_map(check_vma=False) stay exact."""
    return x if axis_name is None else _tp_copy(x, axis_name)


def rmsnorm(x, w, eps):
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * w


def rope(x, positions, theta):
    """Rotary embedding. x: [B, H, T, D]; positions: [B, T] or [T]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs
    cos, sin = jnp.cos(angles), jnp.sin(angles)      # [B,1,T,D/2]
    x1, x2 = x[..., 0::2].astype(jnp.float32), x[..., 1::2].astype(jnp.float32)
    out = jnp.stack(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).reshape(x.shape)
    return out.astype(x.dtype)


def _attention_block(layer, x, cfg, positions, attn_impl=None,
                     tp_axis=None):
    """Full-sequence attention block (training / prefill). Returns
    (out [B,T,dim], (k, v) for cache insertion). Decode paths live in
    decode_step / decode_step_paged. Under TP (tp_axis set, inside
    shard_map with serving_param_shardings) the head dims are local
    shards and the wo row-matmul psums back to the full residual."""
    h = tp_copy(rmsnorm(x, layer["attn_norm"], cfg.norm_eps), tp_axis)
    q = _mm("btd,dhk->bhtk", h, layer["wq"])
    k = _mm("btd,dhk->bhtk", h, layer["wk"])
    v = _mm("btd,dhk->bhtk", h, layer["wv"])
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)
    if attn_impl is None:
        attn_impl = functools.partial(flash_attention, causal=True,
                                      window=cfg.window)
    o = attn_impl(q, k, v)
    out = _psum(_mm("bhtk,hkd->btd", o, layer["wo"]), tp_axis)
    return out, (k, v)


def _mlp_block(layer, x, cfg, tp_axis=None):
    """FFN block. Dispatches on the params: a layer carrying a
    `router` key is a mixture-of-experts layer (models/moe.py) — this
    is what lets every downstream path (training forward, prefill,
    decode_step, the paged serving engine, sampling.generate) run MoE
    models without a parallel code path; `cfg` must then be a
    MoEConfig. The serving MoE path computes experts densely on the
    local device; ep-sharded serving is a future refinement (training
    shards experts via make_moe_train_step)."""
    if "router" in layer:
        # Under TP serving the expert stacks are sharded over tp
        # (serving_param_shardings); tokens replicate and one psum
        # combines — see moe.moe_mlp / moe_mlp_grouped
        # expert_shard_axis.
        from flash_attention_tpu.models.moe import (
            dropless_dispatch_path, moe_mlp, moe_mlp_grouped,
        )

        if getattr(cfg, "routing", "capacity") == "dropless":
            # ADAPTIVE dropless dispatch: the grouped ragged kernel
            # wins above the measured ~4K-token crossover
            # (benchmarks/moe_grouped_vs_onehot); decode-shaped
            # dispatches (n = batch) take the drop-free one-hot cubes
            # instead of paying the sort + visit-plan overhead. Both
            # run under TP (grouped via the kernels' local-band
            # `base`, one-hot via the expert-band slice).
            n = x.shape[0] * x.shape[1]
            if dropless_dispatch_path(n) == "grouped":
                y, _ = moe_mlp_grouped(layer, x, cfg,
                                       expert_shard_axis=tp_axis)
            else:
                y, _ = moe_mlp(layer, x, cfg,
                               expert_shard_axis=tp_axis, capacity=n)
        else:
            y, _ = moe_mlp(layer, x, cfg, expert_shard_axis=tp_axis)
        return y
    h = tp_copy(rmsnorm(x, layer["mlp_norm"], cfg.norm_eps), tp_axis)
    gate = _mm("btd,df->btf", h, layer["w_gate"])
    up = _mm("btd,df->btf", h, layer["w_up"])
    return _psum(_mm("btf,fd->btd", jax.nn.silu(gate) * up,
                     layer["w_down"]), tp_axis)


def forward(params, tokens, cfg: LlamaConfig, *, positions=None,
            remat: bool = False, attn_impl=None):
    """Logits [B, T, vocab] for token ids [B, T] (causal training /
    prefill path)."""
    b, t = tokens.shape
    if positions is None:
        positions = jnp.arange(t, dtype=jnp.int32)
    x = params["embed"][tokens]

    def layer_fn(x, layer):
        a, _ = _attention_block(layer, x, cfg, positions,
                                attn_impl=attn_impl)
        x = x + a
        x = x + _mlp_block(layer, x, cfg)
        return x

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    for layer in params["layers"]:
        x = layer_fn(x, layer)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    return _mm("btd,dv->btv", x, params["lm_head"])


def loss_fn(params, tokens, cfg: LlamaConfig, *, remat: bool = False):
    """Next-token cross-entropy (fp32 logits for the softmax)."""
    logits = forward(params, tokens[:, :-1], cfg, remat=remat)
    targets = tokens[:, 1:]
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(
        logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


def make_train_step(cfg: LlamaConfig, optimizer, *, remat: bool = False):
    """(params, opt_state, tokens) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            functools.partial(loss_fn, cfg=cfg, remat=remat)
        )(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# --- decode path ----------------------------------------------------------


def _lm_head_logits(params, last, tp_axis):
    """lm_head matmul; under TP the vocab dim is column-sharded and the
    full logits row reassembles with a tiled all-gather."""
    logits = _mm("bd,dv->bv", last, params["lm_head"])
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    return logits


def prefill_kv(params, tokens, cfg: LlamaConfig, *, true_len=None,
               tp_axis=None):
    """Prompt forward for paged serving: returns (logits_at_last_token
    [B, vocab], ks, vs) where ks/vs are [n_layers, B, Hkv, T, D] stacks
    ready for page scatter. `true_len` ([B] or int) marks the real prompt
    length when `tokens` is right-padded to a compile bucket — logits are
    taken at position true_len-1 and padded KV positions are garbage the
    caller must not write into pages. Under TP (inside shard_map with
    serving_param_shardings) the returned ks/vs carry the LOCAL KV-head
    shard, matching the tp-sharded pools."""
    b, t = tokens.shape
    positions = jnp.arange(t, dtype=jnp.int32)
    x = params["embed"][tokens]
    ks, vs = [], []
    for layer in params["layers"]:
        a, (k, v) = _attention_block(layer, x, cfg, positions,
                                     tp_axis=tp_axis)
        ks.append(k)
        vs.append(v)
        x = x + a
        x = x + _mlp_block(layer, x, cfg, tp_axis=tp_axis)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if true_len is None:
        last = x[:, -1]
    else:
        idx = jnp.asarray(true_len, jnp.int32) - 1
        idx = jnp.broadcast_to(idx, (b,))
        last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    logits = _lm_head_logits(params, last, tp_axis)
    return logits, jnp.stack(ks), jnp.stack(vs)


def prefill_chunk_step(params, tokens, cfg: LlamaConfig, k_bufs, v_bufs,
                       prefix_len, true_count, tp_axis=None):
    """One chunk of an incremental (chunked) prefill, BATCHED across
    requests.

    The TTFT path: instead of one monolithic prompt forward that blocks
    every live decode slot (the round-1 p50-TTFT weakness), the engine
    interleaves fixed-size prompt chunks with decode steps — and since
    a dispatch costs the full weight read regardless of rows, several
    queued prompts advance in ONE dispatch (each at its own per-row
    offset). Attention for a chunk is computed in two parts and
    LSE-merged (the same recurrence the ring/decode paths use):

      * chunk self-attention — causal flash kernel over the C new rows;
      * prefix attention — non-causal flash kernel over the FULL padded
        KV buffer [T], with positions >= prefix_len[b] masked via
        segment ids (runtime data, so every chunk of every prompt
        length reuses ONE compiled program per (B, C, T) bucket).

    Args:
      tokens: [B, C] ids (garbage-padded past the prompt on the last
        chunk — causal masking keeps real rows from seeing them).
      k_bufs, v_bufs: [L, B, Hkv, T, D] prompt KV buffers (donate them
        in the jitted caller; row b's chunk KV lands at prefix_len[b]).
      prefix_len: [B] (or scalar) int32 — tokens already processed.
      true_count: [B] (or scalar) int32 — real tokens in THIS chunk
        (logits are read at row true_count-1; only meaningful on each
        request's final chunk).

    Returns (logits [B, vocab], k_bufs, v_bufs).
    """
    from flash_attention_tpu.ops.flash import (
        SegmentIds,
        flash_attention_fwd,
    )

    b, c = tokens.shape
    n_layers, _, hkv, t_bucket, hd = k_bufs.shape  # hkv = LOCAL shard under TP
    prefix_len = jnp.broadcast_to(
        jnp.asarray(prefix_len, jnp.int32), (b,))
    positions = prefix_len[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    # Prefix mask: kv ids flip to 1 at prefix_len; q ids stay 0 ->
    # columns >= prefix_len are invisible. The segment-id mask is data,
    # not shape, so chunks at every prefix reuse one compiled kernel.
    seg = SegmentIds(
        jnp.zeros((b, c), jnp.int32),
        (jnp.arange(t_bucket, dtype=jnp.int32)[None, :]
         >= prefix_len[:, None]).astype(jnp.int32),
    )
    x = params["embed"][tokens]
    new_ks, new_vs = [], []
    for li, layer in enumerate(params["layers"]):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
        q = _mm("btd,dhk->bhtk", h, layer["wq"])
        k = _mm("btd,dhk->bhtk", h, layer["wk"])
        v = _mm("btd,dhk->bhtk", h, layer["wv"])
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        new_ks.append(k)
        new_vs.append(v)
        o_s, lse_s = flash_attention_fwd(q, k, v, causal=True, offset=0)
        o_p, lse_p = flash_attention_fwd(
            q, k_bufs[li].astype(q.dtype), v_bufs[li].astype(q.dtype),
            seg, causal=False)
        lse = jnp.logaddexp(lse_s, lse_p)            # [1, H, C, LANES]
        o = (o_s.astype(jnp.float32) * jnp.exp(lse_s - lse)[..., :1]
             + o_p.astype(jnp.float32) * jnp.exp(lse_p - lse)[..., :1])
        x = x + _psum(
            _mm("bhtk,hkd->btd", o.astype(x.dtype), layer["wo"]), tp_axis)
        x = x + _mlp_block(layer, x, cfg, tp_axis=tp_axis)
    # Per-row KV landing offsets (requests in a batched dispatch sit at
    # different prefix depths): vmap the update over the batch axis.
    upd = jax.vmap(
        lambda buf, new, off: jax.lax.dynamic_update_slice(
            buf, new, (0, 0, off, 0)),
        in_axes=(1, 1, 0), out_axes=1)
    k_bufs = upd(k_bufs, jnp.stack(new_ks).astype(k_bufs.dtype),
                 prefix_len)
    v_bufs = upd(v_bufs, jnp.stack(new_vs).astype(v_bufs.dtype),
                 prefix_len)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    idx = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(true_count, jnp.int32), (b,)) - 1, 0)
    last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    logits = _lm_head_logits(params, last, tp_axis)
    return logits, k_bufs, v_bufs


def prefill_window_chunk_step(params, tokens, cfg: LlamaConfig, k_roll,
                              v_roll, prefix_len, true_count,
                              tp_axis=None):
    """One chunk of an incremental prefill for a SLIDING-WINDOW model,
    batched across requests.

    TPU-first design: a windowed query at position p sees only
    [p + 1 - window, p], so the prefill context is a fixed-width
    ROLLING buffer holding the last W_b >= window positions — prompt
    length never enters the compile shape and prefill reads O(window)
    KV per chunk instead of O(prompt). Attention per chunk is two
    static-masked flash calls, LSE-merged:

      * chunk self-attention — causal flash kernel over the C new rows
        with the model window;
      * roll-buffer attention — buffer col j holds absolute position
        prefix_len[b] - W_b + j, so q row i (absolute prefix_len + i)
        relates to cols by a STATIC offset: visible iff
        j >= i + 1 + (W_b - window), exactly the causal kernel with
        offset=W_b (never masks) + window=window. Cols below position
        0 (buffer not yet full) are masked by data-driven segment ids,
        so every (B, C) chunk of every prompt reuses ONE compiled
        program.

    After attention the buffer rolls left by C and the chunk's KV
    appends — a static concatenate, no dynamic update.

    Args:
      tokens: [B, C] ids (garbage-padded past the prompt on the final
        chunk — rows past true_count are never read).
      k_roll, v_roll: [L, B, Hkv, W_b, D] rolling KV buffers (donate in
        the jitted caller), W_b >= window and >= C.
      prefix_len: [B] (or scalar) int32 — tokens already processed.
      true_count: [B] (or scalar) int32 — real tokens in THIS chunk.

    Returns (logits [B, vocab], k_roll, v_roll).
    """
    from flash_attention_tpu.ops.flash import (
        SegmentIds,
        flash_attention_fwd,
    )

    b, c = tokens.shape
    n_layers, _, hkv, w_b, hd = k_roll.shape
    if cfg.window is None:
        raise ValueError("prefill_window_chunk_step needs cfg.window")
    if w_b < cfg.window or w_b < c:
        raise ValueError(f"roll buffer {w_b} must be >= window "
                         f"{cfg.window} and chunk {c}")
    prefix_len = jnp.broadcast_to(
        jnp.asarray(prefix_len, jnp.int32), (b,))
    positions = prefix_len[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    # Buffer cols below absolute position 0 (j < W_b - prefix_len) are
    # invalid until the buffer fills once.
    seg = SegmentIds(
        jnp.zeros((b, c), jnp.int32),
        (jnp.arange(w_b, dtype=jnp.int32)[None, :]
         < w_b - prefix_len[:, None]).astype(jnp.int32),
    )
    x = params["embed"][tokens]
    new_ks, new_vs = [], []
    for li, layer in enumerate(params["layers"]):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
        q = _mm("btd,dhk->bhtk", h, layer["wq"])
        k = _mm("btd,dhk->bhtk", h, layer["wk"])
        v = _mm("btd,dhk->bhtk", h, layer["wv"])
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        new_ks.append(k)
        new_vs.append(v)
        o_s, lse_s = flash_attention_fwd(
            q, k, v, causal=True, offset=0, window=cfg.window)
        o_p, lse_p = flash_attention_fwd(
            q, k_roll[li].astype(q.dtype), v_roll[li].astype(q.dtype),
            seg, causal=True, offset=w_b, window=cfg.window)
        lse = jnp.logaddexp(lse_s, lse_p)            # [B, H, C, LANES]
        o = (o_s.astype(jnp.float32) * jnp.exp(lse_s - lse)[..., :1]
             + o_p.astype(jnp.float32) * jnp.exp(lse_p - lse)[..., :1])
        x = x + _psum(
            _mm("bhtk,hkd->btd", o.astype(x.dtype), layer["wo"]), tp_axis)
        x = x + _mlp_block(layer, x, cfg, tp_axis=tp_axis)
    k_roll = jnp.concatenate(
        [k_roll[:, :, :, c:], jnp.stack(new_ks).astype(k_roll.dtype)],
        axis=3)
    v_roll = jnp.concatenate(
        [v_roll[:, :, :, c:], jnp.stack(new_vs).astype(v_roll.dtype)],
        axis=3)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    idx = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(true_count, jnp.int32), (b,)) - 1, 0)
    last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    logits = _lm_head_logits(params, last, tp_axis)
    return logits, k_roll, v_roll


def _tail_attention(q, kt, vt, tail_pos, scale):
    """Exact attention of q [B, Hkv, G, T, D] (T new positions, e.g.
    1 for plain decode or k+1 for a speculative block) over the dense
    tail buffer kt/vt [B, Hkv, S, D]. Query position t sees tail rows
    [0, tail_pos + t] — causal within the new block, everything before
    it unconditionally. Plain jnp (XLA-fused): the tail is the MUTATED
    segment of the cache, and keeping its consumer out of a Pallas
    custom call is what lets the per-token scatter stay in place
    (custom-call operands cannot alias in-program scatter results; XLA
    inserts full-buffer copies — measured 13 ms/step of copies at 1B
    scale).

    Returns (o [B, Hkv, G, T, D] f32, lse [B, Hkv, G, T] f32).
    """
    s = jnp.einsum(
        "bhgtd,bhsd->bhgts", q.astype(jnp.float32),
        kt.astype(jnp.float32),
    ) * scale
    S = s.shape[-1]
    col = jnp.arange(S)[None, None, None, None, :]
    row = jnp.arange(s.shape[3])[None, None, None, :, None]
    limit = tail_pos[:, None, None, None, None] + row
    s = jnp.where(col > limit, -jnp.inf, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhgts,bhsd->bhgtd", p / l, vt.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0]
    return o, lse


def decode_step_paged(params, token, cfg: LlamaConfig, k_pages, v_pages,
                      k_tails, v_tails, page_tables, paged_lens, tail_pos,
                      k_scales=None, v_scales=None, paged_bases=None,
                      tp_axis=None):
    """One decode step: paged prefix (READ-ONLY Pallas kernel) + dense
    hot-tail buffer (jnp attention, scattered in place).

    Cache layout per layer: tokens [0, paged_lens[b]) live in pages
    (k_pages/v_pages, lists of [Hkv, P, page_size, D]); recent tokens
    [paged_lens[b], paged_lens[b] + tail_pos[b] + 1) live in the tail
    (k_tails/v_tails, lists of [B, Hkv, TAIL, D]). The new token is
    written at tail slot tail_pos[b]; the runtime flushes tails into
    pages in a separate dispatch (kv_cache.flush_tails) when full.

    Pages are never written here, so XLA never copies them; the two
    attention partials merge with the LSE recurrence. Dead slots carry
    paged_lens 0 and tail_pos 0 (their tail write is garbage-in,
    output-unused).

    Under TP (tp_axis set, inside shard_map with
    serving_param_shardings + tp-sharded pools/tails) every matmul and
    the attention kernel run on the LOCAL head shard; one psum per
    block and a logits all-gather reassemble the result — the
    collectives ride the innermost (fastest-ICI) mesh axis.

    Returns (logits [B, vocab], k_tails, v_tails).
    """
    logits, new_k_tails, new_v_tails = decode_step_paged_multi(
        params, token[:, None], cfg, k_pages, v_pages, k_tails, v_tails,
        page_tables, paged_lens, tail_pos, k_scales=k_scales,
        v_scales=v_scales, paged_bases=paged_bases, tp_axis=tp_axis)
    return logits[:, 0], new_k_tails, new_v_tails


def decode_step_paged_multi(params, tokens, cfg: LlamaConfig, k_pages,
                            v_pages, k_tails, v_tails, page_tables,
                            paged_lens, tail_pos, k_scales=None,
                            v_scales=None, paged_bases=None,
                            tp_axis=None):
    """T-token decode step: process tokens [B, T] in ONE forward (one
    weight read for all T positions — the speculative-decoding
    verification primitive; T=1 is the plain decode step).

    Position t of each sequence sits at paged_bases + paged_lens +
    tail_pos + t. All T queries attend the (read-only) paged prefix
    identically, so the paged kernel sees them folded into its GQA
    group dim; causality among the new positions lives in the tail mask
    (query t sees tail rows <= tail_pos + t). All T tokens' KV is
    written into the tail — a speculative caller that rejects a suffix
    simply advances tail_pos by the accepted count, leaving rejected
    rows stale (masked, and overwritten by the next step).

    `paged_bases` [B] (default zeros) counts FRONT-EVICTED tokens of a
    sliding-window sequence: the page table and paged_lens are in
    STORED coordinates (first live page onward) while RoPE positions
    are absolute. The window start in stored coordinates is
    independent of the base (both shift equally), so the kernel mask
    needs no base at all. Under a window, multi-position dispatches
    give each folded query its exact per-position window start
    (paged_flash_decode qpos_spread).

    Returns (logits [B, T, vocab], k_tails, v_tails).
    """
    from flash_attention_tpu.ops.paged import paged_flash_decode

    b, t_new = tokens.shape
    if cfg.window is not None:
        if cfg.window <= k_tails[0].shape[2]:
            raise ValueError(
                f"window={cfg.window} must exceed the tail buffer "
                f"({k_tails[0].shape[2]}) so tail tokens stay visible")
    hkv = k_tails[0].shape[1]          # LOCAL kv heads (= cfg's under tp=1)
    group = cfg.n_heads // cfg.n_kv_heads
    n_heads_local = hkv * group
    hd = cfg.head_dim
    scale = 1.0 / float(np.sqrt(hd))
    if paged_bases is None:
        paged_bases = jnp.zeros_like(paged_lens)
    positions = (paged_bases + paged_lens + tail_pos)[:, None] + \
        jnp.arange(t_new, dtype=jnp.int32)[None, :]   # [B, T]
    bidx = jnp.arange(b)
    trow = tail_pos[:, None] + jnp.arange(t_new)[None, :]  # [B, T]
    x = params["embed"][tokens]                       # [B, T, D]
    new_k_tails, new_v_tails = [], []
    if k_scales is None:
        k_scales = v_scales = [None] * cfg.n_layers
    for layer, kp, vp, kt, vt, ksc, vsc in zip(
            params["layers"], k_pages, v_pages, k_tails, v_tails,
            k_scales, v_scales):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
        q = _mm("btd,dhk->bhtk", h, layer["wq"])
        k = _mm("btd,dhk->bhtk", h, layer["wk"])
        v = _mm("btd,dhk->bhtk", h, layer["wv"])
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        kt = kt.at[bidx[:, None], :, trow, :].set(
            jnp.moveaxis(k, 1, 2).astype(kt.dtype))
        vt = vt.at[bidx[:, None], :, trow, :].set(
            jnp.moveaxis(v, 1, 2).astype(vt.dtype))
        new_k_tails.append(kt)
        new_v_tails.append(vt)

        # [B, Hkv, G, T, D]; fold (G, T) into the paged kernel's group.
        qg = q.reshape(b, hkv, group, t_new, hd)
        win_starts = None
        if cfg.window is not None:
            # Lowest visible STORED position for the query at
            # paged_lens + tail_pos (matching flash_decode's
            # `lengths + 1` bound); the front-evicted base cancels.
            # Later folded positions (t > 0) add t in-kernel
            # (qpos_spread).
            win_starts = jnp.maximum(
                paged_lens + tail_pos + 1 - cfg.window, 0)
        o_p, lse_p = paged_flash_decode(
            qg.reshape(b, hkv * group * t_new, hd), kp, vp,
            page_tables, paged_lens,
            k_scales=ksc, v_scales=vsc, scale=scale,
            window_starts=win_starts, qpos_spread=t_new,
            return_lse=True)
        o_p = o_p.reshape(b, hkv, group, t_new, hd).astype(jnp.float32)
        lse_p = lse_p.reshape(b, hkv, group, t_new)
        o_t, lse_t = _tail_attention(qg, kt, vt, tail_pos, scale)
        lse = jnp.logaddexp(lse_p, lse_t)
        o = (o_p * jnp.exp(lse_p - lse)[..., None]
             + o_t * jnp.exp(lse_t - lse)[..., None])
        o = o.reshape(b, n_heads_local, t_new, hd).astype(x.dtype)
        x = x + _psum(_mm("bhtk,hkd->btd", o, layer["wo"]), tp_axis)
        x = x + _mlp_block(layer, x, cfg, tp_axis=tp_axis)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm("btd,dv->btv", x, params["lm_head"])
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=2, tiled=True)
    return logits, new_k_tails, new_v_tails


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=None):
    """Contiguous per-layer caches [B, Hkv, S, D] (paged serving uses
    runtime/kv_cache.py instead)."""
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_layers)
    ]


def prefill(params, tokens, cfg: LlamaConfig, cache):
    """Run the prompt through the model, filling `cache`. Returns
    (logits_last [B, vocab], cache, lengths)."""
    b, t = tokens.shape
    positions = jnp.arange(t, dtype=jnp.int32)
    x = params["embed"][tokens]
    new_cache = []
    for layer, (ck, cv) in zip(params["layers"], cache):
        a, (k, v) = _attention_block(layer, x, cfg, positions)
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype), (0, 0, 0, 0))
        new_cache.append((ck, cv))
        x = x + a
        x = x + _mlp_block(layer, x, cfg)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm("bd,dv->bv", x[:, -1], params["lm_head"])
    lengths = jnp.full((b,), t, jnp.int32)
    return logits, new_cache, lengths


def _xla_cache_attention(q, ck, cv, lengths, scale, window=None):
    """Masked attention of q [B, Hq, D] over contiguous caches
    [B, Hkv, S, D], visible positions [max(0, len-window), len).
    Plain jnp on purpose: the caller scatters into ck/cv in the same
    program, and keeping the consumer OUT of a Pallas custom call is
    what lets XLA keep that scatter in place (see _tail_attention's
    design note) — this is the draft-model decode path, where the
    cache is re-scattered every scan step."""
    b, hq, d = q.shape
    hkv = ck.shape[1]
    qg = q.reshape(b, hkv, hq // hkv, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg,
                   ck.astype(jnp.float32)) * scale
    col = jnp.arange(ck.shape[2])[None, None, None, :]
    bad = col >= lengths[:, None, None, None]
    if window is not None:
        bad = bad | (col < (lengths - window)[:, None, None, None])
    s = jnp.where(bad, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgs,bhsd->bhgd", p, cv.astype(jnp.float32))
    return o.reshape(b, hq, d)


def decode_step(params, token, cfg: LlamaConfig, cache, lengths, *,
                use_flash: bool = True):
    """One decode step. token: [B] ids; returns (logits [B, vocab],
    cache, lengths+1). use_flash=False keeps attention in plain XLA
    ops so the per-step cache scatter stays in place inside a scan
    (the fused draft-model loop)."""
    b = token.shape[0]
    positions = lengths[:, None]                      # [B, 1]
    x = params["embed"][token][:, None]               # [B, 1, D]
    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    new_cache = []
    for layer, (ck, cv) in zip(params["layers"], cache):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
        q = _mm("btd,dhk->bhtk", h, layer["wq"])
        k = _mm("btd,dhk->bhtk", h, layer["wk"])
        v = _mm("btd,dhk->bhtk", h, layer["wv"])
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        # Write the new token at its position in the cache.
        bidx = jnp.arange(b)
        ck = ck.at[bidx, :, lengths].set(k[:, :, 0].astype(ck.dtype))
        cv = cv.at[bidx, :, lengths].set(v[:, :, 0].astype(cv.dtype))
        new_cache.append((ck, cv))
        if use_flash:
            o = flash_decode(q[:, :, 0], ck, cv, lengths + 1,
                             window=cfg.window)[:, :, None]
        else:
            o = _xla_cache_attention(
                q[:, :, 0], ck, cv, lengths + 1, scale,
                window=cfg.window).astype(x.dtype)[:, :, None]
        x = x + _mm("bhtk,hkd->btd", o, layer["wo"])
        x = x + _mlp_block(layer, x, cfg)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm("bd,dv->bv", x[:, 0], params["lm_head"])
    return logits, new_cache, lengths + 1
