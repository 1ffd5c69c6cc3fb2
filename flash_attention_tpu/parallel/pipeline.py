"""Pipeline parallelism: GPipe-style microbatched training over a `pp`
mesh axis.

TPU-native scaling substrate with no reference counterpart (the
reference is single-GPU, SURVEY.md §5 "distributed backend: absent") —
this is the layer-stage axis of the standard dp/pp/fsdp/sp/tp/ep
decomposition. Design:

  * The transformer layer stack is split into `pp` contiguous stages;
    each stage's layer parameters live on one pipeline rank (leaves of
    the stacked layer pytree are sharded `P("pp")` on the layer dim).
  * One fused SPMD program (shard_map over the whole mesh) runs the
    classic GPipe schedule as a `lax.scan` over M + S - 1 ticks: at
    every tick each rank applies its local layer slab to the
    activation it holds, then hands it to the next rank with a
    non-wrapping `lax.ppermute` — point-to-point neighbor traffic on
    the `pp` axis, never a broadcast.
  * Rank 0 injects a fresh microbatch each tick (embedding lookup);
    the last rank finishes microbatch t-(S-1) at tick t and folds its
    next-token cross-entropy into the loss. A `psum` over `pp` makes
    the scalar loss SPMD-uniform, and `jax.grad` differentiates through
    the whole schedule (the transpose of a non-wrapping ppermute is the
    reversed ppermute, so backward activations flow last -> first exactly
    like GPipe's backward phase).
  * Data parallel composes: the batch is sharded over `dp`, gradients
    psum-mean over `dp` inside the same program. The optimizer update
    runs under the surrounding jit on the pp-sharded param/grad trees,
    so optimizer state shards with the stages for free.

Bubble fraction is the GPipe (S-1)/(M+S-1); pick n_microbatches >= 4*S
to keep it under ~20%. Known inefficiency, documented: every rank
executes the (masked) lm-head + CE computation each tick because the
SPMD program is rank-uniform; a 1F1B schedule with stage-specialized
programs is the next refinement, not needed at dryrun scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    _attention_block,
    _mlp_block,
    _mm,
    rmsnorm,
)


def split_pipeline_params(params, n_stages: int):
    """Split a Llama param pytree into (stages, shared).

    stages: the per-layer dicts stacked on a leading layer dim
    [n_layers, ...] — shard `P("pp")` on dim 0 (n_layers must divide by
    n_stages, each rank holding a contiguous [n_layers/pp, ...] slab).
    shared: embed / final_norm / lm_head, replicated over pp (consumed
    only by the first/last rank but kept uniform for the SPMD program).
    """
    layers = params["layers"]
    if len(layers) % n_stages:
        raise ValueError(
            f"n_layers={len(layers)} not divisible by pp={n_stages}")
    stages = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    shared = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }
    return stages, shared


def merge_pipeline_params(stages, shared):
    """Inverse of split_pipeline_params (for checkpoint interchange)."""
    n_layers = jax.tree.leaves(stages)[0].shape[0]
    layers = [jax.tree.map(lambda x: x[i], stages) for i in range(n_layers)]
    return {"layers": layers, **shared}


def pipeline_shardings(mesh, stages, shared, opt_state=None, *,
                       optimizer=None, tp_axis=None):
    """NamedShardings placing the stacked stages over pp (and, with
    `tp_axis`, head/ffn dims over tp — the pp x tp composition) and the
    shared params replicated (lm_head vocab-sharded under tp).

    Optimizer-state shardings are derived STRUCTURALLY when the
    `optimizer` is passed: `optax.tree_map_params` maps each
    param-shaped state leaf (moments etc.) to its parameter's sharding
    and every non-param leaf (step counts) to replicated — no shape
    heuristics (a replicated leaf whose dim-0 coincidentally equals
    n_layers can no longer be missharded). The legacy shape rule
    remains as a fallback when no optimizer is given."""
    if tp_axis is not None:
        specs = _stage_leaf_specs(None, tp_axis)
        stage_tree = {k: NamedSharding(mesh, specs[k]) for k in stages}
    else:
        stage_tree = jax.tree.map(
            lambda _: NamedSharding(mesh, P("pp")), stages)
    repl = NamedSharding(mesh, P())
    shared_tree = {
        "embed": repl, "final_norm": repl,
        "lm_head": NamedSharding(mesh, P(None, tp_axis))
        if tp_axis else repl,
    }
    out = (stage_tree, shared_tree)
    if opt_state is not None:
        if optimizer is not None:
            import optax

            param_sh = (stage_tree, shared_tree)
            opt_tree = optax.tree_map_params(
                optimizer, lambda _, s: s, opt_state, param_sh,
                transform_non_params=lambda _: repl)
        else:
            n_layers = jax.tree.leaves(stages)[0].shape[0]
            stage_s = NamedSharding(mesh, P("pp"))

            def rule(leaf):
                return stage_s if (
                    leaf.ndim and leaf.shape[0] == n_layers) else repl

            opt_tree = jax.tree.map(rule, opt_state)
        out = out + (opt_tree,)
    return out


def _build_local_loss(cfg: LlamaConfig, n_stages: int, *,
                      remat: bool = False):
    """Per-shard GPipe-schedule loss, shared by the train step and the
    eval path. Runs inside shard_map; tokens_local [M, b_local, T]."""
    S = n_stages

    def apply_stage(stage_local, x, positions):
        def layer_step(h, layer):
            a, _ = _attention_block(layer, h, cfg, positions)
            h = h + a
            h = h + _mlp_block(layer, h, cfg)
            return h, None

        if remat:
            layer_step = jax.checkpoint(layer_step)
        x, _ = jax.lax.scan(layer_step, x, stage_local)
        return x

    def local_loss(stage_local, shared, tokens_local):
        m, b, t = tokens_local.shape
        rank = jax.lax.axis_index("pp")
        positions = jnp.arange(t - 1, dtype=jnp.int32)
        # Embed all microbatches up front (uniform program; only rank
        # 0's copy is consumed). Inputs drop the last token, targets
        # the first. Zero-pad so the drained ticks index real storage.
        emb = shared["embed"][tokens_local[:, :, :-1]]
        emb = jnp.concatenate(
            [emb, jnp.zeros((S - 1,) + emb.shape[1:], emb.dtype)])
        targets = tokens_local[:, :, 1:]

        def tick(buf, step):
            x = jnp.where(rank == 0, emb[step], buf)
            y = apply_stage(stage_local, x, positions)
            nxt = jax.lax.ppermute(
                y, "pp", [(i, i + 1) for i in range(S - 1)])
            # Last rank: microbatch step-(S-1) just completed.
            mb = step - (S - 1)
            h = rmsnorm(y, shared["final_norm"], cfg.norm_eps)
            logits = _mm("btd,dv->btv", h, shared["lm_head"]).astype(
                jnp.float32)
            tgt = targets[jnp.clip(mb, 0, m - 1)]
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(
                logits, tgt[..., None], axis=-1)[..., 0]
            ce = jnp.mean(logz - gold)
            use = jnp.logical_and(rank == S - 1, mb >= 0)
            return nxt, jnp.where(use, ce, 0.0)

        zero = jnp.zeros((b, t - 1, cfg.dim), emb.dtype)
        _, losses = jax.lax.scan(
            tick, zero, jnp.arange(m + S - 1, dtype=jnp.int32))
        # Mean over microbatches. The sum is nonzero on the LAST rank
        # only — deliberately NOT psummed here: under check_vma=False
        # the transpose of psum is psum, so differentiating through a
        # loss-psum would scale every gradient by the pp axis size.
        # Callers psum the VALUE after taking gradients; gradients
        # themselves route across ranks through the ppermute transpose.
        return jnp.sum(losses) / m

    return local_loss


def make_pp_train_step(mesh, cfg: LlamaConfig, optimizer, *,
                       remat: bool = False):
    """Build `step(stages, shared, opt_state, tokens) -> (stages,
    shared, opt_state, loss)` jitted over a mesh with dp and pp axes.

    tokens: [n_microbatches, batch, T] int32, batch sharded over dp.
    Loss is mean next-token CE over microbatches and dp shards.
    """
    S = mesh.shape["pp"]
    dp = mesh.shape["dp"]
    local_loss = _build_local_loss(cfg, S, remat=remat)

    def local_grads(stage_local, shared, tokens_local):
        loss, (g_stage, g_shared) = jax.value_and_grad(
            local_loss, argnums=(0, 1))(stage_local, shared, tokens_local)
        loss = jax.lax.psum(loss, "pp")   # value only; grads are done
        if dp > 1:
            # Mean over dp shards (loss AND grads — grad of the mean).
            loss = jax.lax.psum(loss, "dp") / dp
            g_stage = jax.tree.map(
                lambda g: jax.lax.psum(g, "dp") / dp, g_stage)
            g_shared = jax.tree.map(
                lambda g: jax.lax.psum(g, "dp") / dp, g_shared)
        # Shared-param grads land on the rank that consumed them (embed
        # on rank 0, head/norm on the last); reduce over pp so the
        # replicated update stays consistent.
        g_shared = jax.tree.map(
            lambda g: jax.lax.psum(g, "pp"), g_shared)
        return loss, g_stage, g_shared

    grad_fn = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P("pp"), P(), P(None, "dp", None)),
        out_specs=(P(), P("pp"), P()),
        check_vma=False,
    )

    @jax.jit
    def step(stages, shared, opt_state, tokens):
        import optax

        loss, g_stage, g_shared = grad_fn(stages, shared, tokens)
        params = (stages, shared)
        updates, opt_state = optimizer.update(
            (g_stage, g_shared), opt_state, params)
        stages, shared = optax.apply_updates(params, updates)
        return stages, shared, opt_state, loss

    return step


def _stage_fns(cfg: LlamaConfig, tp_axis=None):
    """Stage forward + last-rank tail (final norm -> lm head -> CE),
    shared by the 1F1B schedule's fwd and recompute-vjp paths."""

    def apply_stage(stage_local, x, positions):
        def layer_step(h, layer):
            a, _ = _attention_block(layer, h, cfg, positions,
                                    tp_axis=tp_axis)
            h = h + a
            h = h + _mlp_block(layer, h, cfg, tp_axis=tp_axis)
            return h, None

        x, _ = jax.lax.scan(layer_step, x, stage_local)
        return x

    def tail_loss(stage_local, shared, x, targets):
        from flash_attention_tpu.models.llama import _psum, tp_copy

        y = apply_stage(stage_local, x, positions=jnp.arange(
            x.shape[1], dtype=jnp.int32))
        h = tp_copy(rmsnorm(y, shared["final_norm"], cfg.norm_eps),
                    tp_axis)
        logits = _mm("btd,dv->btv", h, shared["lm_head"]).astype(
            jnp.float32)
        if tp_axis is None:
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(
                logits, targets[..., None], axis=-1)[..., 0]
            return jnp.mean(logz - gold)
        # Vocab-parallel CE (Megatron): local-shard max/sum/gather with
        # one psum each — never materializes the gathered logits, and
        # every local logit contributes to exactly one differentiated
        # path (the redundant all-gather-then-CE would over-count
        # cotangents under check_vma=False).
        v_local = logits.shape[-1]
        rank = jax.lax.axis_index(tp_axis)
        # stop_gradient on the max shift: exact for logsumexp, and it
        # keeps the non-linear pmax out of the transposed path.
        m_loc = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
        m_glob = jax.lax.pmax(m_loc, tp_axis)
        sumexp = _psum(
            jnp.sum(jnp.exp(logits - m_glob[..., None]), axis=-1),
            tp_axis)
        logz = m_glob + jnp.log(sumexp)
        tloc = targets - rank * v_local
        hit = (tloc >= 0) & (tloc < v_local)
        gold_loc = jnp.take_along_axis(
            logits, jnp.clip(tloc, 0, v_local - 1)[..., None],
            axis=-1)[..., 0]
        gold = _psum(jnp.where(hit, gold_loc, 0.0), tp_axis)
        return jnp.mean(logz - gold)

    return apply_stage, tail_loss


def make_pp_train_step_1f1b(mesh, cfg: LlamaConfig, optimizer):
    """1F1B pipelined training step — the memory-bounded, stage-
    specialized successor to the GPipe schedule above (round-2 verdict
    item 6).

    Differences from `make_pp_train_step`:

      * **1F1B steady state.** One SPMD `lax.scan` over 2M + 2S - 2
        HALF-ticks; rank r runs forward of microbatch j at half-tick
        2j + r and backward at 2j + 2S - 1 - r — the canonical
        non-interleaved 1F1B timetable (each rank alternates F and B in
        steady state). In-flight activations per rank are bounded by a
        ring buffer of S stage INPUTS — O(S) regardless of the
        microbatch count M, vs the GPipe schedule's O(M + S) stored
        ticks.
      * **Explicit in-schedule VJPs.** Backward ticks recompute the
        stage forward from the stored input and apply the arriving
        cotangent with `jax.vjp` (stage-granularity rematerialization);
        nothing differentiates *through* the schedule or its ppermutes,
        so gradients are exact by construction and the psum-transpose
        trap that blocked pp x tp in round 2 disappears.
      * **Stage-specialized compute.** Only rank 0 embeds (per-tick
        gather); only the last rank runs the lm-head + CE (inside its
        backward vjp, where it is needed anyway). No rank burns masked
        lm-head FLOPs every tick — at S=4 that removes 3/4 of the
        GPipe schedule's head compute.
      * **pp x tp composes.** When the mesh has a tp axis > 1, stage
        layers run the Megatron block splits (tp psums inside the
        vjp'd functions; shard_map check_vma=True gives psum its
        correct transpose).

    tokens: [n_microbatches, batch, T] int32, batch sharded over dp.
    Returns `step(stages, shared, opt_state, tokens) -> (stages,
    shared, opt_state, loss)`.
    """
    import functools as _ft

    S = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if tp > 1 else None
    apply_stage, tail_loss = _stage_fns(cfg, tp_axis=tp_axis)

    def local_step(stage_local, shared, tokens_local):
        m, b, t = tokens_local.shape
        rank = jax.lax.axis_index("pp")
        positions = jnp.arange(t - 1, dtype=jnp.int32)
        dim_local = stage_local["wq"].shape[1]  # d replicated over tp
        half_ticks = 2 * m + 2 * S - 2

        zero_x = jnp.zeros((b, t - 1, dim_local), cfg.dtype)
        g_stage0 = jax.tree.map(jnp.zeros_like, stage_local)
        g_shared0 = jax.tree.map(jnp.zeros_like, shared)

        def fwd_tick(x_in, fifo, j):
            x = jax.lax.cond(
                rank == 0,
                lambda: shared["embed"][
                    jax.lax.dynamic_index_in_dim(
                        tokens_local, j, keepdims=False)[:, :-1]],
                lambda: x_in)
            fifo = jax.lax.dynamic_update_index_in_dim(
                fifo, x, j % S, axis=0)
            y = apply_stage(stage_local, x, positions)
            return y, fifo

        def bwd_tick(g_in, fifo, j):
            x_saved = jax.lax.dynamic_index_in_dim(
                fifo, j % S, keepdims=False)
            targets = jax.lax.dynamic_index_in_dim(
                tokens_local, j, keepdims=False)[:, 1:]

            def last_rank():
                loss_j, (gs, gsh, gx) = jax.value_and_grad(
                    tail_loss, argnums=(0, 1, 2))(
                    stage_local, shared, x_saved, targets)
                return loss_j, gs, gsh, gx

            def mid_rank():
                y, vjp = jax.vjp(
                    lambda p, x: apply_stage(p, x, positions),
                    stage_local, x_saved)
                gs, gx = vjp(g_in.astype(y.dtype))
                return 0.0, gs, g_shared0, gx

            loss_j, gs, gsh, gx = jax.lax.cond(
                rank == S - 1, last_rank, mid_rank)

            def embed_grad():
                # Rank 0's input cotangent is w.r.t. the embedding
                # rows it gathered: scatter-add into the embed grad.
                tok = jax.lax.dynamic_index_in_dim(
                    tokens_local, j, keepdims=False)[:, :-1]
                return gsh["embed"].at[tok].add(
                    gx.astype(gsh["embed"].dtype))

            gsh = {**gsh, "embed": jax.lax.cond(
                rank == 0, embed_grad, lambda: gsh["embed"])}
            return loss_j, gs, gsh, gx

        def tick(carry, h):
            (x_in, g_in, fifo, loss_sum, g_stage, g_shared) = carry
            jf = (h - rank) // 2
            f_act = ((h - rank) >= 0) & ((h - rank) % 2 == 0) & (jf < m)
            jb = (h - (2 * S - 1 - rank)) // 2
            b_act = (((h - (2 * S - 1 - rank)) >= 0)
                     & ((h - (2 * S - 1 - rank)) % 2 == 0) & (jb < m))

            y = jax.lax.cond(
                f_act,
                lambda: fwd_tick(x_in, fifo, jnp.maximum(jf, 0)),
                lambda: (x_in, fifo))
            y, fifo = y

            loss_j, gs_d, gsh_d, gx = jax.lax.cond(
                b_act,
                lambda: bwd_tick(g_in, fifo, jnp.maximum(jb, 0)),
                lambda: (0.0, g_stage0, g_shared0, g_in))

            loss_sum = loss_sum + loss_j
            g_stage = jax.tree.map(jnp.add, g_stage, gs_d)
            g_shared = jax.tree.map(jnp.add, g_shared, gsh_d)

            x_nxt = jax.lax.ppermute(
                y, "pp", [(i, i + 1) for i in range(S - 1)])
            g_nxt = jax.lax.ppermute(
                gx, "pp", [(i, i - 1) for i in range(1, S)])
            return (x_nxt, g_nxt, fifo, loss_sum, g_stage,
                    g_shared), None

        fifo0 = jnp.zeros((S, b, t - 1, dim_local), cfg.dtype)
        carry0 = (zero_x, zero_x, fifo0, 0.0, g_stage0, g_shared0)
        (_, _, _, loss_sum, g_stage, g_shared), _ = jax.lax.scan(
            tick, carry0, jnp.arange(half_ticks, dtype=jnp.int32))

        loss = jax.lax.psum(loss_sum / m, "pp")
        g_stage = jax.tree.map(lambda g: g / m, g_stage)
        g_shared = jax.tree.map(
            lambda g: jax.lax.psum(g / m, "pp"), g_shared)
        if dp > 1:
            loss = jax.lax.psum(loss, "dp") / dp
            g_stage = jax.tree.map(
                lambda g: jax.lax.psum(g, "dp") / dp, g_stage)
            g_shared = jax.tree.map(
                lambda g: jax.lax.psum(g, "dp") / dp, g_shared)
        # Under tp, shared-replicated grads (embed, final_norm) are
        # already exact and tp-invariant: every replicated activation
        # entering a tp region passes tp_copy (bwd all-reduce), so the
        # cotangents feeding them are full sums, not partials.
        return loss, g_stage, g_shared

    stage_specs = _stage_leaf_specs(cfg, tp_axis)
    shared_specs = {
        "embed": P(), "final_norm": P(),
        "lm_head": P(None, "tp") if tp_axis else P(),
    }
    grad_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(stage_specs, shared_specs, P(None, "dp", None)),
        out_specs=(P(), stage_specs, shared_specs),
        check_vma=False,
    )

    @jax.jit
    def step(stages, shared, opt_state, tokens):
        import optax

        loss, g_stage, g_shared = grad_fn(stages, shared, tokens)
        params = (stages, shared)
        updates, opt_state = optimizer.update(
            (g_stage, g_shared), opt_state, params)
        stages, shared = optax.apply_updates(params, updates)
        return stages, shared, opt_state, loss

    return step


def _stage_leaf_specs(cfg: LlamaConfig, tp_axis):
    """Per-leaf PartitionSpecs for the stacked stage tree: layer dim on
    pp, head/ffn dims on tp (Megatron splits) when composing."""
    if tp_axis is None:
        base = {k: P("pp") for k in (
            "attn_norm", "wq", "wk", "wv", "wo", "mlp_norm",
            "w_gate", "w_up", "w_down")}
        return base
    return {
        "attn_norm": P("pp"),
        "wq": P("pp", None, "tp", None),
        "wk": P("pp", None, "tp", None),
        "wv": P("pp", None, "tp", None),
        "wo": P("pp", "tp", None, None),
        "mlp_norm": P("pp"),
        "w_gate": P("pp", None, "tp"),
        "w_up": P("pp", None, "tp"),
        "w_down": P("pp", "tp", None),
    }


def make_pp_loss(mesh, cfg: LlamaConfig):
    """Forward-only pipelined loss `fn(stages, shared, tokens) -> loss`
    (evaluation path); same schedule as the train step, no backward."""
    S = mesh.shape["pp"]
    dp = mesh.shape["dp"]
    local_loss = _build_local_loss(cfg, S)

    def local(stage_local, shared, tokens_local):
        loss = jax.lax.psum(
            local_loss(stage_local, shared, tokens_local), "pp")
        if dp > 1:
            loss = jax.lax.psum(loss, "dp") / dp
        return loss

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("pp"), P(), P(None, "dp", None)),
        out_specs=P(), check_vma=False,
    ))
