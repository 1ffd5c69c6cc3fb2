"""Llama model family: forward, loss, train step, prefill/decode
consistency, sharded training on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step,
    forward,
    init_kv_cache,
    init_params,
    loss_fn,
    make_train_step,
    param_shardings,
    prefill,
)
from flash_attention_tpu.models.sampling import generate, sample
from flash_attention_tpu.parallel.mesh import make_mesh

CFG = LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture
def tokens(rng):
    return jnp.asarray(
        rng.integers(0, CFG.vocab_size, (2, 64)), jnp.int32)


def test_forward_shapes_and_finite(params, tokens):
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 64, CFG.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_forward_is_causal(params, tokens):
    # Changing a future token must not change past logits.
    logits_a = forward(params, tokens, CFG)
    tampered = tokens.at[:, -1].set((tokens[:, -1] + 1) % CFG.vocab_size)
    logits_b = forward(params, tampered, CFG)
    np.testing.assert_allclose(
        np.asarray(logits_a[:, :-1]), np.asarray(logits_b[:, :-1]),
        atol=1e-5)


@pytest.mark.slow
def test_loss_decreases_under_training(params, tokens):
    opt = optax.adamw(3e-3)
    step = jax.jit(make_train_step(CFG, opt))
    opt_state = opt.init(params)
    p = params
    losses = []
    for _ in range(5):
        p, opt_state, loss = step(p, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_remat_matches_no_remat(params, tokens):
    a = loss_fn(params, tokens, CFG, remat=False)
    b = loss_fn(params, tokens, CFG, remat=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_prefill_decode_matches_forward(params, tokens):
    """Teacher-forced decode must reproduce the parallel forward —
    verifies RoPE positions, cache writes, and flash_decode together."""
    t = 16
    toks = tokens[:, :t]
    full_logits = forward(params, toks, CFG)
    cache = init_kv_cache(CFG, 2, 32)
    logits_p, cache, lengths = prefill(params, toks[:, : t - 4], CFG, cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, t - 5]),
        rtol=2e-3, atol=2e-5)
    # Feed the true next tokens one at a time.
    for i in range(t - 4, t):
        logits_d, cache, lengths = decode_step(
            params, toks[:, i], CFG, cache, lengths)
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(full_logits[:, i]),
            rtol=2e-3, atol=2e-5)


def test_generate_greedy_deterministic(params, tokens):
    out1 = generate(params, tokens[:, :8], CFG, max_new_tokens=4)
    out2 = generate(params, tokens[:, :8], CFG, max_new_tokens=4)
    assert out1.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_sample_top_k(rng):
    logits = jnp.asarray(rng.normal(0, 1, (4, 100)), jnp.float32)
    tok = sample(logits, jax.random.PRNGKey(0), temperature=1.0, top_k=5)
    # Every sampled token must be among that row's top-5.
    top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
    for i, t in enumerate(np.asarray(tok)):
        assert t in top5[i]


@pytest.mark.slow
def test_sharded_train_step_on_mesh(tokens):
    """Full fsdp x tp sharded training step — the multi-chip path the
    driver dry-runs."""
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = param_shardings(cfg, tp_size=2)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    params = jax.tree.map(jax.device_put, params, shardings)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))
    tok_sharded = jax.device_put(
        tokens, NamedSharding(mesh, P(None, None)))
    p2, _, loss = step(params, opt_state, tok_sharded)
    assert np.isfinite(float(loss))
    # Params keep their shardings through the update (trailing Nones are
    # normalized away by jax, so compare the leading axes).
    assert tuple(p2["layers"][0]["wq"].sharding.spec)[:2] == ("fsdp", "tp")


def test_sample_top_p(rng):
    from flash_attention_tpu.models.sampling import sample

    # A distribution where the top-2 tokens carry ~88% of the mass:
    # nucleus p=0.5 must keep only the argmax-adjacent head.
    base = np.full((4, 50), -10.0, np.float32)
    base[:, 3] = 3.0
    base[:, 7] = 2.0
    base[:, 11] = 1.0
    logits = jnp.asarray(base)
    for i in range(20):
        tok = sample(logits, jax.random.PRNGKey(i), temperature=1.0,
                     top_p=0.5)
        assert set(np.asarray(tok)) <= {3, 7}, np.asarray(tok)
    # p ~ 1 keeps everything samplable; argmax always survives even
    # with tiny p.
    tok = sample(logits, jax.random.PRNGKey(0), temperature=1.0,
                 top_p=1e-6)
    np.testing.assert_array_equal(np.asarray(tok), 3)
