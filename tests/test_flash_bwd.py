"""Backward (custom_vjp) gradient checks vs autodiff of the exact
reference — the check the reference repo lacks (SURVEY.md §4: backward
was only exercised through loss.backward(), never verified)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.config import BlockSizes
from flash_attention_tpu.ops.flash import flash_attention
from flash_attention_tpu.ops.reference import attention_reference
from flash_attention_tpu.utils.metrics import verify

SMALL_BLOCKS = BlockSizes(
    block_q=128, block_kv=128, block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)


def grads(fn, q, k, v, seed=7):
    # Random cotangent, fixed seed; loss = sum(o * ct) exercises full VJP.
    ct = jax.random.normal(jax.random.PRNGKey(seed), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) * ct)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_matches_reference_grads(qkv_factory, causal):
    q, k, v = qkv_factory(1, 2, 2, 256, 256, 64, jnp.float32)
    flash = lambda q, k, v: flash_attention(
        q, k, v, causal=causal, block_sizes=SMALL_BLOCKS
    )
    ref = lambda q, k, v: attention_reference(q, k, v, causal=causal)
    dq, dk, dv = grads(flash, q, k, v)
    dq_r, dk_r, dv_r = grads(ref, q, k, v)
    for name, a, b in [("dq", dq, dq_r), ("dk", dk, dk_r), ("dv", dv, dv_r)]:
        report = verify(a, b)
        assert report.passed, f"{name}: {report}"


def test_bwd_gqa(qkv_factory):
    q, k, v = qkv_factory(1, 4, 2, 128, 128, 64, jnp.float32)
    flash = lambda q, k, v: flash_attention(
        q, k, v, causal=True, block_sizes=SMALL_BLOCKS
    )
    ref = lambda q, k, v: attention_reference(q, k, v, causal=True)
    for name, a, b in zip(
        ("dq", "dk", "dv"), grads(flash, q, k, v), grads(ref, q, k, v)
    ):
        report = verify(a, b)
        assert report.passed, f"{name}: {report}"


def test_bwd_unpadded_seq(qkv_factory):
    q, k, v = qkv_factory(1, 2, 2, 200, 200, 64, jnp.float32)
    flash = lambda q, k, v: flash_attention(
        q, k, v, causal=True, block_sizes=SMALL_BLOCKS
    )
    ref = lambda q, k, v: attention_reference(q, k, v, causal=True)
    for name, a, b in zip(
        ("dq", "dk", "dv"), grads(flash, q, k, v), grads(ref, q, k, v)
    ):
        report = verify(a, b)
        assert report.passed, f"{name}: {report}"
        assert not np.any(np.isnan(np.asarray(a))), f"{name} has NaNs"


def test_bwd_decode_offset(qkv_factory):
    # Nq < Nk causal: gradient flow with the kv-offset mask.
    q, k, v = qkv_factory(1, 2, 2, 128, 256, 64, jnp.float32)
    flash = lambda q, k, v: flash_attention(
        q, k, v, causal=True, block_sizes=SMALL_BLOCKS
    )
    ref = lambda q, k, v: attention_reference(q, k, v, causal=True)
    for name, a, b in zip(
        ("dq", "dk", "dv"), grads(flash, q, k, v), grads(ref, q, k, v)
    ):
        report = verify(a, b)
        assert report.passed, f"{name}: {report}"


def test_bwd_multi_kv_blocks(qkv_factory):
    # KV longer than one block in both bwd kernels.
    blocks = BlockSizes(
        block_q=128, block_kv=128, block_q_dq=128, block_kv_dq=128,
        block_q_dkv=128, block_kv_dkv=128,
    )
    q, k, v = qkv_factory(1, 1, 1, 384, 384, 64, jnp.float32)
    flash = lambda q, k, v: flash_attention(q, k, v, block_sizes=blocks)
    ref = lambda q, k, v: attention_reference(q, k, v)
    for name, a, b in zip(
        ("dq", "dk", "dv"), grads(flash, q, k, v), grads(ref, q, k, v)
    ):
        report = verify(a, b)
        assert report.passed, f"{name}: {report}"
