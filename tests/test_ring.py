"""Ring attention on the virtual 8-device CPU mesh vs single-device
reference — the multi-device testing the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.reference import attention_reference
from flash_attention_tpu.parallel.mesh import make_mesh, mesh_shape_for
from flash_attention_tpu.parallel.ring import (
    make_ring_attention,
    zigzag_inverse,
    zigzag_order,
)
from flash_attention_tpu.utils.metrics import verify

BLOCKS = BlockSizes(block_q=128, block_kv=128)


def test_mesh_shape_inference():
    assert mesh_shape_for(8, sp=-1) == {
        "dp": 1, "pp": 1, "fsdp": 1, "sp": 8, "tp": 1, "ep": 1}
    assert mesh_shape_for(8, dp=2, tp=-1) == {
        "dp": 2, "pp": 1, "fsdp": 1, "sp": 1, "tp": 4, "ep": 1}
    assert mesh_shape_for(8, pp=2, ep=-1) == {
        "dp": 1, "pp": 2, "fsdp": 1, "sp": 1, "tp": 1, "ep": 4}
    with pytest.raises(ValueError):
        mesh_shape_for(8, dp=3)
    with pytest.raises(ValueError):
        mesh_shape_for(8, dp=-1, tp=-1)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(rng, causal):
    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, N, D = 1, 2, 128 * n_dev, 64
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)

    ring = make_ring_attention(mesh, causal=causal, block_sizes=BLOCKS)
    out = ring(q, k, v)
    ref = attention_reference(q, k, v, causal=causal)
    report = verify(out, ref)
    assert report.passed, str(report)


@pytest.mark.slow
def test_ring_attention_gqa_with_dp(rng):
    # Compose dp x sp; GQA heads.
    mesh = make_mesh(dp=2, sp=4)
    B, HQ, HKV, N, D = 2, 4, 2, 512, 64
    q = jnp.asarray(rng.normal(0, 0.02, (B, HQ, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, HKV, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, HKV, N, D)), jnp.float32)
    spec = P("dp", None, "sp", None)
    ring = make_ring_attention(mesh, causal=True, qkv_spec=spec,
                               block_sizes=BLOCKS)
    out = ring(q, k, v)
    ref = attention_reference(q, k, v, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


def test_zigzag_permutation_roundtrip():
    p = zigzag_order(16, 4)
    inv = zigzag_inverse(16, 4)
    np.testing.assert_array_equal(p[inv], np.arange(16))
    # Device 0's shard = chunks 0 and 7 of the 8-way split.
    np.testing.assert_array_equal(p[:4], [0, 1, 14, 15])


@pytest.mark.slow
def test_ring_attention_zigzag_causal_matches_reference(rng):
    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, D = 1, 2, 64
    N = 2 * 128 * n_dev                   # 2 chunks of 128 per device
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    perm = zigzag_order(N, n_dev)
    inv = zigzag_inverse(N, n_dev)

    ring = make_ring_attention(mesh, causal=True, layout="zigzag",
                               block_sizes=BLOCKS)
    out = ring(q[:, :, perm], k[:, :, perm], v[:, :, perm])[:, :, inv]
    ref = attention_reference(q, k, v, causal=True)
    assert verify(out, ref).passed


@pytest.mark.parametrize("causal,layout", [
    pytest.param(False, "contiguous", marks=pytest.mark.slow),
    (True, "contiguous"),
    pytest.param(True, "zigzag", marks=pytest.mark.slow),
])
def test_ring_attention_gradients_match_reference(rng, causal, layout):
    """Ring custom-VJP (rotating dK/dV accumulators) vs autodiff through
    the exact reference."""
    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, D = 1, 2, 64
    N = (2 if layout == "zigzag" else 1) * 128 * n_dev
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    if layout == "zigzag":
        perm = zigzag_order(N, n_dev)
        inv = zigzag_inverse(N, n_dev)
    else:
        perm = inv = np.arange(N)

    ring = make_ring_attention(mesh, causal=causal, layout=layout,
                               block_sizes=BLOCKS)

    def ring_loss(q, k, v):
        out = ring(q[:, :, perm], k[:, :, perm], v[:, :, perm])[:, :, inv]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        out = attention_reference(q, k, v, causal=causal)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(ring_loss, (0, 1, 2))(q, k, v)
    refs = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for g, r, name in zip(grads, refs, "qkv"):
        rep = verify(g, r)
        assert rep.passed, f"d{name}: {rep}"


def test_ring_attention_jit_compiles_with_sharding(rng):
    # Under jit with sharded inputs (the production path).
    mesh = make_mesh(sp=len(jax.devices()))
    B, H, N, D = 1, 2, 128 * len(jax.devices()), 64
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    q = jax.device_put(
        jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32), sh)
    k = jax.device_put(
        jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32), sh)
    v = jax.device_put(
        jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32), sh)
    ring = jax.jit(make_ring_attention(mesh, causal=True,
                                       block_sizes=BLOCKS))
    out = ring(q, k, v)
    ref = attention_reference(q, k, v, causal=True)
    assert verify(out, ref).passed
    # Output keeps the sequence sharding.
    assert out.sharding.spec == P(None, None, "sp", None)


@pytest.mark.slow
def test_ring_attention_inside_model_training(rng):
    """Long-context training e2e: the model's attention runs ring
    attention over an sp mesh (differentiable custom-VJP path); the
    loss and gradient must match single-device training."""
    import optax
    from flash_attention_tpu.models.llama import (
        LlamaConfig, init_params, loss_fn,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    seq = 128 * n_dev
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size,
                                          (1, seq + 1)), jnp.int32)

    ring = make_ring_attention(mesh, causal=True, block_sizes=BLOCKS)

    def ring_loss(params):
        from flash_attention_tpu.models.llama import forward
        logits = forward(params, tokens[:, :-1], cfg, attn_impl=ring)
        targets = tokens[:, 1:]
        logits = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(
            logits, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(logz - gold)

    def base_loss(params):
        return loss_fn(params, tokens, cfg)

    lr, gr = jax.value_and_grad(ring_loss)(params)
    lb, gb = jax.value_and_grad(base_loss)(params)
    np.testing.assert_allclose(float(lr), float(lb), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


# --- feature parity with the single-chip kernel: window + segments -----


@pytest.mark.slow
def test_ring_attention_sliding_window_matches_reference(rng):
    """Causal sliding window across ring steps (contiguous layout):
    window spans chunk boundaries, old chunks drop out entirely."""
    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, N, D = 1, 2, 128 * n_dev, 64
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    for window in (100, 300):   # < one chunk / spanning several chunks
        ring = make_ring_attention(mesh, causal=True, window=window,
                                   block_sizes=BLOCKS)
        out = ring(q, k, v)
        ref = attention_reference(q, k, v, causal=True, window=window)
        report = verify(out, ref)
        assert report.passed, f"window={window}: {report}"


@pytest.mark.slow
def test_ring_attention_window_gradients_match_reference(rng):
    from flash_attention_tpu.ops.flash import flash_attention

    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, N, D, W = 1, 2, 128 * n_dev, 64, 200
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    ring = make_ring_attention(mesh, causal=True, window=W,
                               block_sizes=BLOCKS)

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v).astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        out = flash_attention(q, k, v, causal=True, window=W,
                              block_sizes=BLOCKS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(ring_loss, (0, 1, 2))(q, k, v)
    refs = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for g, r, name in zip(grads, refs, "qkv"):
        rep = verify(g, r)
        assert rep.passed, f"d{name}: {rep}"


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_attention_segments_match_reference(rng, layout):
    """Packed-sequence segment ids under sequence parallelism: kv ids
    rotate with their chunks; documents never cross-attend even when a
    document spans a chunk boundary."""
    from flash_attention_tpu.ops.flash import SegmentIds
    from tests.test_segments import make_segments, masked_reference

    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, D = 1, 2, 64
    N = (2 if layout == "zigzag" else 1) * 128 * n_dev
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    seg = make_segments(np.random.default_rng(11), B, N, max_docs=5)
    if layout == "zigzag":
        perm = zigzag_order(N, n_dev)
        inv = zigzag_inverse(N, n_dev)
    else:
        perm = inv = np.arange(N)

    ring = make_ring_attention(mesh, causal=True, layout=layout,
                               segmented=True, block_sizes=BLOCKS)
    out = ring(q[:, :, perm], k[:, :, perm], v[:, :, perm],
               SegmentIds(seg[:, perm], seg[:, perm]))[:, :, inv]
    ref = masked_reference(q, k, v, seg, seg, causal=True)
    report = verify(out, ref)
    assert report.passed, str(report)


@pytest.mark.slow
def test_ring_attention_segments_gradients_match_reference(rng):
    from flash_attention_tpu.ops.flash import SegmentIds, flash_attention
    from tests.test_segments import make_segments

    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    B, H, N, D = 1, 2, 128 * n_dev, 64
    q = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.02, (B, H, N, D)), jnp.float32)
    seg = make_segments(np.random.default_rng(12), B, N, max_docs=4)
    sids = SegmentIds(seg, seg)
    ring = make_ring_attention(mesh, causal=True, segmented=True,
                               block_sizes=BLOCKS)

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v, sids).astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        out = flash_attention(q, k, v, sids, causal=True,
                              block_sizes=BLOCKS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(ring_loss, (0, 1, 2))(q, k, v)
    refs = jax.grad(ref_loss, (0, 1, 2))(q, k, v)
    for g, r, name in zip(grads, refs, "qkv"):
        rep = verify(g, r)
        assert rep.passed, f"d{name}: {rep}"


def test_ring_window_zigzag_raises():
    from flash_attention_tpu.parallel.ring import ring_attention

    with pytest.raises(NotImplementedError):
        # shape-only check happens before any mesh work
        q = jnp.zeros((1, 1, 128, 64), jnp.float32)
        ring_attention(q, q, q, axis_name="sp", causal=True,
                       layout="zigzag", window=64)
