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


def pipeline_shardings(mesh, stages, shared, opt_state=None):
    """NamedShardings placing the stacked stages over pp and the shared
    params replicated; optimizer-state trees reuse the same leaf rule
    (leaves carrying the layer dim shard, scalars replicate)."""
    stage_s = NamedSharding(mesh, P("pp"))
    repl = NamedSharding(mesh, P())
    out = (
        jax.tree.map(lambda _: stage_s, stages),
        jax.tree.map(lambda _: repl, shared),
    )
    if opt_state is not None:
        n_layers = jax.tree.leaves(stages)[0].shape[0]

        def rule(leaf):
            return stage_s if (leaf.ndim and leaf.shape[0] == n_layers) \
                else repl

        out = out + (jax.tree.map(rule, opt_state),)
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
