"""Mixture-of-Experts model family with expert parallelism (`ep`).

North-star extension with no reference counterpart (the reference is a
single-GPU kernel study, SURVEY.md §0); this is the MoE member of the
model zoo next to the dense Llama family, built TPU-first:

  * **GShard-style capacity routing**: top-k softmax gating with a
    static per-expert capacity; dispatch/combine are dense one-hot
    einsums over [tokens, experts, capacity] — static shapes, MXU
    matmuls, no data-dependent gather/scatter, exactly the layout XLA
    SPMD was built around. Tokens that overflow an expert's capacity
    are dropped (weight renormalized away), the documented GShard/
    Switch behavior; `capacity_factor` sizes the slack.
  * **Expert parallelism**: experts are sharded over the `ep` mesh
    axis; tokens are data-parallel over `ep` (the standard
    expert+data topology). Each shard routes its local tokens, then a
    tiled `lax.all_to_all` swaps the [E, C, d] dispatch cube so every
    rank holds ALL ranks' slots for ITS local experts, runs the expert
    FFNs, and a second all_to_all routes results back — two
    collectives per MoE layer, both riding the innermost ICI axis.
  * **Router health**: Switch load-balance loss (E * sum_e f_e * p_e)
    and router z-loss, both returned as aux and folded into the
    training objective with configurable coefficients.

The dense path (`ep_axis=None`) computes the identical capacity-routed
math without collectives, so sharded-vs-dense parity is exact — the
same self-verifying-pair pattern the kernel tests use (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    _attention_block,
    _mm,
    rmsnorm,
)


@dataclasses.dataclass(frozen=True)
class MoEConfig(LlamaConfig):
    n_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    load_balance_coef: float = 1e-2
    router_z_coef: float = 1e-3
    # "capacity": GShard capacity routing through dense one-hot
    # dispatch/combine einsums (training path: everything is a plain
    # differentiable einsum). "dropless": sort-by-expert + grouped
    # ragged matmul (ops/grouped.py) — the serving path; dispatch cost
    # O(n log n + n·d) instead of the one-hot cubes' O(n·E·C·d), no
    # token drops, quantized expert stacks fuse dequant in-kernel.
    routing: str = "capacity"

    @staticmethod
    def tiny_moe(**kw) -> "MoEConfig":
        return MoEConfig(
            vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=512, n_experts=8, top_k=2, **kw)

    @staticmethod
    def mixtral_8x7b(**kw) -> "MoEConfig":
        """Mixtral-8x7B-class shapes (8 experts, top-2). Any field may
        be overridden (n_layers=16 is the bench-what-fits single-chip
        int4 config, docs/SERVING.md)."""
        base = dict(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336, n_experts=8, top_k=2)
        base.update(kw)
        return MoEConfig(**base)


def expert_capacity(n_tokens: int, cfg: MoEConfig) -> int:
    """Static per-expert slot count, padded to a lane-friendly multiple
    of 8 (the fp32 sublane tile)."""
    c = math.ceil(cfg.top_k * n_tokens * cfg.capacity_factor
                  / cfg.n_experts)
    return max(8, -(-c // 8) * 8)


def init_moe_params(cfg: MoEConfig, key) -> dict:
    """Llama-style init with each layer's dense MLP replaced by a
    router + per-expert SwiGLU stack [E, ...]."""
    d, hd, f, e = cfg.dim, cfg.head_dim, cfg.ffn_dim, cfg.n_experts
    keys = jax.random.split(key, 4 + cfg.n_layers)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) /
                np.sqrt(fan_in)).astype(cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 9)
        layers.append({
            "attn_norm": jnp.ones((d,), cfg.dtype),
            "wq": dense(lk[0], (d, cfg.n_heads, hd), d),
            "wk": dense(lk[1], (d, cfg.n_kv_heads, hd), d),
            "wv": dense(lk[2], (d, cfg.n_kv_heads, hd), d),
            "wo": dense(lk[3], (cfg.n_heads, hd, d), cfg.n_heads * hd),
            "mlp_norm": jnp.ones((d,), cfg.dtype),
            # Router stays fp32: tiny, and gate ordering is precision
            # -sensitive.
            "router": jax.random.normal(lk[4], (d, e), jnp.float32) / np.sqrt(d),
            "w_gate": dense(lk[5], (e, d, f), d),
            "w_up": dense(lk[6], (e, d, f), d),
            "w_down": dense(lk[7], (e, f, d), f),
        })
    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": dense(keys[1], (d, cfg.vocab_size), d),
    }


def moe_param_shardings(cfg: MoEConfig) -> dict:
    """PartitionSpecs for the ep topology: expert stacks shard their
    leading E dim over `ep`; everything else replicates (tp/fsdp
    composition is orthogonal and layered the same way as the dense
    family's param_shardings)."""
    from jax.sharding import PartitionSpec as P

    layer = {
        "attn_norm": P(), "wq": P(), "wk": P(), "wv": P(), "wo": P(),
        "mlp_norm": P(), "router": P(),
        "w_gate": P("ep"), "w_up": P("ep"), "w_down": P("ep"),
    }
    return {
        "embed": P(),
        "layers": [layer] * cfg.n_layers,
        "final_norm": P(),
        "lm_head": P(),
    }


def route_tokens(logits, top_k: int, capacity: int):
    """GShard top-k capacity routing.

    logits: [n, E] fp32 router scores for n tokens.
    Returns (dispatch [n, E, C] {0,1}, combine [n, E, C] gate weights,
    aux dict). Lower-k choices take slot priority; a choice whose
    expert is full is dropped (its one_hot(position >= C) row is zero
    and its gate weight is renormalized over the surviving choices).
    """
    n, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    masked = probs
    choices, gates = [], []
    for _ in range(top_k):
        idx = jnp.argmax(masked, axis=-1)                     # [n]
        oh = jax.nn.one_hot(idx, e, dtype=probs.dtype)        # [n, E]
        gates.append(jnp.sum(probs * oh, axis=-1))            # [n]
        choices.append(oh)
        masked = masked * (1.0 - oh)

    counts = jnp.zeros((e,), jnp.float32)
    dispatch = jnp.zeros((n, e, capacity), probs.dtype)
    kept_gates = []
    for oh, gate in zip(choices, gates):
        # Slot index = experts' running fill + this token's rank among
        # same-choice tokens (exclusive prefix count).
        pos = jnp.cumsum(oh, axis=0) - oh + counts[None, :]   # [n, E]
        slot = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)   # [n]
        # one_hot of an out-of-capacity slot is all-zero: the drop.
        d_k = oh[:, :, None] * jax.nn.one_hot(
            slot, capacity, dtype=probs.dtype)[:, None, :]
        dispatch = dispatch + d_k
        kept = jnp.sum(d_k, axis=(1, 2))                      # [n] {0,1}
        kept_gates.append(gate * kept)
        counts = counts + jnp.sum(oh, axis=0)

    # Combine: weight each dispatch slot by its choice's renormalized
    # gate (rebuilt from the same slot recurrence).
    denom = sum(kept_gates) + 1e-9
    combine = jnp.zeros_like(dispatch)
    counts2 = jnp.zeros((e,), jnp.float32)
    for oh, kg in zip(choices, kept_gates):
        pos = jnp.cumsum(oh, axis=0) - oh + counts2[None, :]
        slot = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)
        d_k = oh[:, :, None] * jax.nn.one_hot(
            slot, capacity, dtype=probs.dtype)[:, None, :]
        combine = combine + (kg / denom)[:, None, None] * d_k
        counts2 = counts2 + jnp.sum(oh, axis=0)

    # Switch load-balance loss: E * sum_e (token fraction)(prob mass),
    # over top-1 assignments; z-loss tames router logit growth.
    f_e = jnp.mean(choices[0], axis=0)
    p_e = jnp.mean(probs, axis=0)
    aux = {
        "load_balance": e * jnp.sum(f_e * p_e),
        "router_z": jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2),
        "dropped_frac": 1.0 - jnp.sum(dispatch) / (n * len(choices)),
    }
    return dispatch, combine, aux


# Dispatch-size crossover between the two dropless implementations,
# measured on v5e at Mixtral layer shapes (benchmarks/
# moe_grouped_vs_onehot): the sort+ragged-kernel path loses to the
# one-hot cubes below ~4K tokens (0.68x at 2048) and wins above.
# Override with FA_TPU_GROUPED_MIN_TOKENS for measurement sweeps.
GROUPED_MIN_TOKENS = 4096


def dropless_dispatch_path(n_tokens: int) -> str:
    """Which dropless implementation a dispatch of `n_tokens` should
    take: 'grouped' (sort-by-expert + ragged Pallas matmul) at/above
    the measured crossover, 'onehot' (drop-free capacity cubes) below
    it — decode-shaped dispatches (n = batch) are far below, full
    prefills far above. Pure function of the (static) token count, so
    the choice is a trace-time constant."""
    import os

    thr = int(os.environ.get("FA_TPU_GROUPED_MIN_TOKENS",
                             GROUPED_MIN_TOKENS))
    return "grouped" if n_tokens >= thr else "onehot"


def moe_mlp(layer, x, cfg: MoEConfig, ep_axis=None,
            expert_shard_axis=None, capacity=None):
    """Capacity-routed expert MLP. x: [B, T, d]. Returns (y, aux).

    `capacity` overrides the capacity-factor formula; `capacity=n`
    (the token count) makes the path DROP-FREE — the small-dispatch
    dropless route (dropless_dispatch_path), where the one-hot cubes
    are cheap because n is small.

    Three placements:
      * both axes None — every expert computed locally (dense
        reference; also the single-device serving path);
      * ep_axis set (training, inside shard_map): TOKENS are sharded
        over ep and so are the expert stacks; two tiled all_to_alls
        swap token slots against expert shards;
      * expert_shard_axis set (TP serving, inside shard_map): tokens
        REPLICATED on every rank, expert stacks sharded; each rank
        routes identically, computes only its local experts' slots,
        and one psum stitches the combine — the same
        one-collective-per-block shape as the dense family's Megatron
        split, so MoE models run under the TP-sharded engine.
    """
    if ep_axis is not None and expert_shard_axis is not None:
        raise ValueError("ep_axis and expert_shard_axis are exclusive")
    b, t, d = x.shape
    n = b * t
    h = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    flat = h.reshape(n, d)
    logits = flat.astype(jnp.float32) @ layer["router"]
    if capacity is None:
        capacity = expert_capacity(n, cfg)
    else:
        capacity = max(8, -(-int(capacity) // 8) * 8)
    dispatch, combine, aux = route_tokens(logits, cfg.top_k, capacity)
    dispatch = dispatch.astype(flat.dtype)
    combine = combine.astype(flat.dtype)

    if expert_shard_axis is not None:
        # Routing above covered ALL experts (replicated math); slice
        # this rank's expert band out of the dispatch/combine cubes.
        e_local = layer["w_gate"].shape[0]
        start = jax.lax.axis_index(expert_shard_axis) * e_local
        dispatch = jax.lax.dynamic_slice_in_dim(
            dispatch, start, e_local, 1)
        combine = jax.lax.dynamic_slice_in_dim(combine, start, e_local, 1)

    xs = jnp.einsum("nec,nd->ecd", dispatch, flat)      # [E, C, d]
    if ep_axis is not None:
        # [E, C, d] -> [E/ep, ep*C, d]: every rank now holds all ranks'
        # slots for its local experts.
        xs = jax.lax.all_to_all(
            xs, ep_axis, split_axis=0, concat_axis=1, tiled=True)
    g = _expert_stack_mm(xs, layer["w_gate"])
    u = _expert_stack_mm(xs, layer["w_up"])
    ys = _expert_stack_mm(jax.nn.silu(g) * u, layer["w_down"])
    if ep_axis is not None:
        ys = jax.lax.all_to_all(
            ys, ep_axis, split_axis=1, concat_axis=0, tiled=True)
    y = jnp.einsum("nec,ecd->nd", combine, ys)
    if expert_shard_axis is not None:
        y = jax.lax.psum(y, expert_shard_axis)
    return y.reshape(b, t, d), aux


def route_topk(logits, top_k: int):
    """Dropless top-k routing: full-softmax probabilities, keep the
    top-k experts per token, renormalize the kept gates. Matches the
    capacity path's combine weights exactly whenever nothing drops
    (route_tokens renormalizes over kept choices with the same
    denominator). Returns (gates [n, k] f32, experts [n, k] int32)."""
    probs = jax.nn.softmax(logits, axis=-1)
    gates, experts = jax.lax.top_k(probs, top_k)
    gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
    return gates, experts.astype(jnp.int32)


def _expert_stack_mm(xs, w, group_sizes=None, base=None):
    """Expert matmul dispatch. Capacity path (group_sizes None):
    xs [E, C, d] batched against the stack. Grouped path: xs [M, d]
    expert-sorted rows through the ragged Pallas kernels
    (ops/grouped.py) with in-kernel dequant for quantized stacks;
    `base` offsets group 0's first row (the tensor-parallel local
    band — rows outside [base, base+sum(group_sizes)) come back 0)."""
    from flash_attention_tpu.models.quantized import (
        Int4ExpertStack,
        QuantizedExpertStack,
    )

    if group_sizes is None:
        if isinstance(w, (QuantizedExpertStack, Int4ExpertStack)):
            w = w.dequant(xs.dtype)
        return jnp.einsum("ecd,edf->ecf", xs, w)
    from flash_attention_tpu.ops.grouped import (
        grouped_int4_matmul,
        grouped_matmul,
        grouped_quant_matmul,
    )

    if isinstance(w, Int4ExpertStack):
        return grouped_int4_matmul(xs, group_sizes, w.packed, w.scales,
                                   base=base)
    if isinstance(w, QuantizedExpertStack):
        return grouped_quant_matmul(xs, group_sizes, w.q, w.scale,
                                    base=base)
    return grouped_matmul(xs, group_sizes, w, base=base)


def moe_mlp_grouped(layer, x, cfg: MoEConfig, expert_shard_axis=None):
    """Dropless expert MLP via sort-by-expert + grouped ragged matmul
    (the serving path; cfg.routing == "dropless").

    x: [B, T, d]. Returns (y, aux) like moe_mlp. No capacity, no token
    drops: every top-k assignment computes. The one-hot [n, E, C]
    dispatch/combine cubes (O(n·E·C·d) MXU work, quadratic in sequence
    length) are replaced by one argsort over n·k int32 keys plus
    gather/gather — the combine is a GATHER through the inverse
    permutation, not a scatter (TPU-friendly).

    expert_shard_axis (TP serving, inside shard_map): tokens are
    replicated, expert stacks sharded — every rank sorts identically
    and the ragged kernels compute only the LOCAL expert band via
    their `base` row offset (rows outside the band return 0); one psum
    stitches the combine, the same one-collective-per-block shape as
    the dense Megatron split.
    """
    b, t, d = x.shape
    n = b * t
    k = cfg.top_k
    h = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    flat = h.reshape(n, d)
    logits = flat.astype(jnp.float32) @ layer["router"]
    gates, experts = route_topk(logits, k)

    flat_e = experts.reshape(-1)                       # [n*k]
    perm = jnp.argsort(flat_e)                         # sorted pos <- flat
    xs = jnp.take(flat, perm // k, axis=0)             # [n*k, d] sorted
    group_sizes = jnp.bincount(flat_e, length=cfg.n_experts)

    base = None
    if expert_shard_axis is not None:
        e_local = layer["w_gate"].shape[0]
        start = jax.lax.axis_index(expert_shard_axis) * e_local
        offs = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(group_sizes).astype(jnp.int32)])
        base = jnp.take(offs, start)
        group_sizes = jax.lax.dynamic_slice_in_dim(
            group_sizes, start, e_local)

    g = _expert_stack_mm(xs, layer["w_gate"], group_sizes, base=base)
    u = _expert_stack_mm(xs, layer["w_up"], group_sizes, base=base)
    a = jax.nn.silu(g) * u
    yd = _expert_stack_mm(a.astype(flat.dtype), layer["w_down"],
                          group_sizes, base=base)      # [n*k, d]

    inv = jnp.argsort(perm)                            # flat -> sorted pos
    ys = jnp.take(yd, inv.reshape(n, k), axis=0)       # [n, k, d]
    y = jnp.sum(ys * gates.astype(ys.dtype)[..., None], axis=1)
    if expert_shard_axis is not None:
        y = jax.lax.psum(y, expert_shard_axis)
    probs = jax.nn.softmax(logits, axis=-1)
    aux = {
        "load_balance": cfg.n_experts * jnp.sum(
            jnp.mean(jax.nn.one_hot(experts[:, 0], cfg.n_experts), axis=0)
            * jnp.mean(probs, axis=0)),
        "router_z": jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2),
        "dropped_frac": jnp.zeros((), jnp.float32),
    }
    return y.reshape(b, t, d), aux


def moe_forward(params, tokens, cfg: MoEConfig, *, positions=None,
                ep_axis=None, remat: bool = False):
    """Logits [B, T, vocab] + mean aux dict over layers."""
    b, t = tokens.shape
    if positions is None:
        positions = jnp.arange(t, dtype=jnp.int32)
    x = params["embed"][tokens]
    totals = {"load_balance": 0.0, "router_z": 0.0, "dropped_frac": 0.0}

    def layer_fn(x, layer):
        a, _ = _attention_block(layer, x, cfg, positions)
        x = x + a
        if cfg.routing == "dropless" and ep_axis is None:
            y, aux = moe_mlp_grouped(layer, x, cfg)
        else:
            y, aux = moe_mlp(layer, x, cfg, ep_axis=ep_axis)
        return x + y, aux

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    for layer in params["layers"]:
        x, aux = layer_fn(x, layer)
        totals = {k: totals[k] + aux[k] for k in totals}
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm("btd,dv->btv", x, params["lm_head"])
    return logits, {k: v / cfg.n_layers for k, v in totals.items()}


def moe_loss_fn(params, tokens, cfg: MoEConfig, *, ep_axis=None,
                remat: bool = False):
    """Next-token CE + router aux objectives. Returns (loss, metrics)."""
    logits, aux = moe_forward(
        params, tokens[:, :-1], cfg, ep_axis=ep_axis, remat=remat)
    targets = tokens[:, 1:]
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    ce = jnp.mean(logz - gold)
    loss = (ce + cfg.load_balance_coef * aux["load_balance"]
            + cfg.router_z_coef * aux["router_z"])
    return loss, {"ce": ce, **aux}


def make_moe_train_step(mesh, cfg: MoEConfig, optimizer, *,
                        remat: bool = False):
    """Expert+data-parallel training step over a mesh with dp and ep
    axes: tokens sharded over (dp, ep), expert stacks sharded over ep,
    everything else replicated.

    Returns step(params, opt_state, tokens) -> (params, opt_state,
    loss, metrics); tokens [B, T] with B divisible by dp*ep.
    """
    from jax.sharding import PartitionSpec as P

    dp, ep = mesh.shape["dp"], mesh.shape["ep"]
    if cfg.n_experts % ep:
        raise ValueError(
            f"ep={ep} must divide n_experts={cfg.n_experts}")
    data = dp * ep
    specs = moe_param_shardings(cfg)

    def local_grads(params, tokens_local):
        (loss, metrics), grads = jax.value_and_grad(
            moe_loss_fn, has_aux=True)(
                params, tokens_local, cfg,
                ep_axis="ep" if ep > 1 else None, remat=remat)
        # Mean over the token shards (dp x ep both carry data). Expert
        # -sharded leaves hold DIFFERENT experts on each ep rank, so
        # they reduce over dp only; psumming them over ep would mix
        # distinct experts' gradients.
        if data > 1:
            loss, metrics = jax.tree.map(
                lambda v: jax.lax.psum(v, ("dp", "ep")) / data,
                (loss, metrics))
            grads = jax.tree.map(
                lambda s, g: jax.lax.psum(
                    g, "dp" if "ep" in s else ("dp", "ep")) / data,
                specs, grads, is_leaf=lambda x: isinstance(x, P))
        return loss, metrics, grads

    grad_fn = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(specs, P(("dp", "ep"), None)),
        out_specs=(P(), P(), specs),
        check_vma=False)

    @jax.jit
    def step(params, opt_state, tokens):
        import optax

        loss, metrics, grads = grad_fn(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step
