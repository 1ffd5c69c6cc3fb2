"""Bench harness + driver entry points on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.utils.bench import (
    attention_flops,
    attention_hbm_bytes,
    bench_attention,
    find_max_batch,
    measure,
)


def test_measure_returns_positive_time():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((128, 128))
    t = measure(f, x, warmup=1, iters=2, inner=4)
    assert t.mean_s > 0 or t.min_s >= 0  # slope can be ~0 for trivial ops
    assert t.iters == 2


def test_flops_model():
    # 4*B*H*Nq*Nk*D (pmph-a6.tex:174); causal halves it.
    assert attention_flops(1, 32, 8192, 8192, 128) == 4 * 32 * 8192**2 * 128
    assert attention_flops(2, 4, 128, 256, 64, causal=True) == \
        4 * 2 * 4 * 128 * 256 * 64 // 2


def test_hbm_bytes_model():
    # q + o read/write + k + v, GQA-aware.
    b = attention_hbm_bytes(1, 8, 2, 1024, 1024, 128, itemsize=2)
    assert b == (2 * 8 * 1024 * 128 + 2 * 2 * 1024 * 128) * 2


def test_bench_attention_report(qkv_factory):
    from flash_attention_tpu.ops.reference import attention_reference
    q, k, v = qkv_factory(1, 2, 2, 128, 128, 64, jnp.float32)
    fn = jax.jit(lambda q, k, v: attention_reference(q, k, v))
    r = bench_attention("ref", fn, q, k, v, warmup=1, iters=2, inner=3)
    assert r.tflops_per_s >= 0
    assert "ref" in r.line()


def test_find_max_batch_monotone():
    # Fake runner that "OOMs" above batch 11.
    def run(b):
        if b > 11:
            raise RuntimeError("RESOURCE EXHAUSTED: out of memory")

    assert find_max_batch(run) == 11
    assert find_max_batch(lambda b: (_ for _ in ()).throw(
        RuntimeError("out of memory")), start=1) == 0


def test_graft_entry_single():
    import __graft_entry__ as g
    fn, args = g.entry()
    o = jax.jit(fn)(*args)
    params, tokens = args
    assert o.shape[:2] == tokens.shape  # [B, T, vocab] logits
    assert o.ndim == 3


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))
