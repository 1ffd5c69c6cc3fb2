"""Pipeline parallelism (GPipe schedule over the pp mesh axis):
split/merge roundtrip, loss parity vs the single-device model, and
exact train-step parity (same SGD update through the pipelined
backward)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    init_params,
    loss_fn,
    make_train_step,
)
from flash_attention_tpu.parallel.mesh import make_mesh
from flash_attention_tpu.parallel.pipeline import (
    make_pp_loss,
    make_pp_train_step,
    merge_pipeline_params,
    pipeline_shardings,
    split_pipeline_params,
)

CFG = LlamaConfig.tiny(dtype=jnp.float32)
CFG = LlamaConfig(**{**CFG.__dict__, "n_layers": 4})
M, B, T = 4, 4, 32  # microbatches x batch x seq


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture
def tokens(rng):
    return jnp.asarray(
        rng.integers(0, CFG.vocab_size, (M, B, T)), jnp.int32)


def test_split_merge_roundtrip(params):
    stages, shared = split_pipeline_params(params, 4)
    assert jax.tree.leaves(stages)[0].shape[0] == CFG.n_layers
    merged = merge_pipeline_params(stages, shared)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        split_pipeline_params(params, 3)


def test_pp_loss_matches_single_device(params, tokens):
    """The pipelined schedule computes exactly the single-device loss."""
    mesh = make_mesh(pp=4, dp=2)
    stages, shared = split_pipeline_params(params, 4)
    got = make_pp_loss(mesh, CFG)(stages, shared, tokens)
    want = loss_fn(params, tokens.reshape(M * B, T), CFG)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.slow
def test_pp_train_step_matches_single_device(params, tokens):
    """One SGD step through the pipelined backward must produce the
    same parameters as the plain single-device train step (ppermute
    transpose correctness + dp gradient psum-mean + shared-param psum
    all verified at once)."""
    lr = 1e-2
    mesh = make_mesh(pp=4, dp=2)
    stages, shared = split_pipeline_params(params, 4)
    opt = optax.sgd(lr)
    opt_state = opt.init((stages, shared))
    step = make_pp_train_step(mesh, CFG, opt)
    s2, sh2, _, loss_pp = step(stages, shared, opt_state, tokens)

    ref_opt = optax.sgd(lr)
    ref_step = jax.jit(make_train_step(CFG, ref_opt))
    p2, _, loss_ref = ref_step(
        params, ref_opt.init(params), tokens.reshape(M * B, T))
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)

    got = merge_pipeline_params(s2, sh2)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p2),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(ka))


@pytest.mark.slow
def test_pp_train_loss_decreases(params, tokens):
    mesh = make_mesh(pp=2, dp=-1)
    stages, shared = split_pipeline_params(params, 2)
    opt = optax.adamw(3e-3)
    opt_state = opt.init((stages, shared))
    st_sh, sh_sh, opt_sh = pipeline_shardings(
        mesh, stages, shared, opt_state)
    stages = jax.tree.map(jax.device_put, stages, st_sh)
    shared = jax.tree.map(jax.device_put, shared, sh_sh)
    opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)
    step = make_pp_train_step(mesh, CFG, opt, remat=True)
    losses = []
    for _ in range(4):
        stages, shared, opt_state, loss = step(
            stages, shared, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # Stage params keep their pp sharding through the update.
    spec = jax.tree.leaves(stages)[0].sharding.spec
    assert tuple(spec)[:1] == ("pp",)


@pytest.mark.slow
def test_1f1b_train_step_matches_single_device(params, tokens):
    """The 1F1B schedule (explicit in-schedule VJPs, stage-granular
    recompute, stage-specialized embed/head) produces the same SGD
    update and loss as the plain single-device step."""
    from flash_attention_tpu.parallel.pipeline import (
        make_pp_train_step_1f1b,
    )

    lr = 1e-2
    mesh = make_mesh(pp=4, dp=2)
    stages, shared = split_pipeline_params(params, 4)
    opt = optax.sgd(lr)
    opt_state = opt.init((stages, shared))
    step = make_pp_train_step_1f1b(mesh, CFG, opt)
    s2, sh2, _, loss_pp = step(stages, shared, opt_state, tokens)

    ref_opt = optax.sgd(lr)
    ref_step = jax.jit(make_train_step(CFG, ref_opt))
    p2, _, loss_ref = ref_step(
        params, ref_opt.init(params), tokens.reshape(M * B, T))
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=1e-5)
    got = merge_pipeline_params(s2, sh2)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p2),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(ka))


@pytest.mark.slow
def test_1f1b_pp_x_tp_composes(params, tokens):
    """pp x tp: 2 stages x 2-way tensor parallel x 2-way dp. Megatron
    splits inside the vjp'd stage functions (tp_copy / _psum custom
    transposes + vocab-parallel CE) must reproduce the single-device
    update exactly — the round-2 psum-transpose blocker."""
    from flash_attention_tpu.parallel.pipeline import (
        make_pp_train_step_1f1b,
    )

    lr = 1e-2
    mesh = make_mesh(pp=2, tp=2, dp=2)
    stages, shared = split_pipeline_params(params, 2)
    opt = optax.sgd(lr)
    opt_state = opt.init((stages, shared))
    st_sh, sh_sh, opt_sh = pipeline_shardings(
        mesh, stages, shared, opt_state, optimizer=opt, tp_axis="tp")
    stages = jax.tree.map(jax.device_put, stages, st_sh)
    shared = jax.tree.map(jax.device_put, shared, sh_sh)
    opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)
    step = make_pp_train_step_1f1b(mesh, CFG, opt)
    s2, sh2, _, loss_pp = step(stages, shared, opt_state, tokens)

    ref_opt = optax.sgd(lr)
    ref_step = jax.jit(make_train_step(CFG, ref_opt))
    p2, _, loss_ref = ref_step(
        params, ref_opt.init(params), tokens.reshape(M * B, T))
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=1e-5)
    got = merge_pipeline_params(s2, sh2)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p2),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(ka))


def test_pipeline_shardings_structural_opt_state(params):
    """ADVICE r2: opt-state shardings derive structurally via
    optax.tree_map_params — a replicated shared-param moment whose
    dim 0 equals n_layers is no longer missharded."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(pp=2, dp=-1)
    stages, shared = split_pipeline_params(params, 2)
    # Make the hazard real: embed's moment has shape[0] == n_layers.
    shared = dict(shared)
    shared["embed"] = shared["embed"][:CFG.n_layers]
    opt = optax.adam(1e-3)
    opt_state = opt.init((stages, shared))
    _, _, opt_sh = pipeline_shardings(
        mesh, stages, shared, opt_state, optimizer=opt)
    flat = jax.tree_util.tree_leaves_with_path(
        opt_sh, is_leaf=lambda x: hasattr(x, "spec"))
    embed_specs = [tuple(v.spec) for p, v in flat
                   if "embed" in str(p) and hasattr(v, "spec")]
    # Every embed moment must be REPLICATED, not P("pp") — the legacy
    # shape rule would have missharded them (dim 0 == n_layers).
    assert embed_specs, "probe found no embed opt-state leaves"
    for spec in embed_specs:
        assert "pp" not in spec, spec
