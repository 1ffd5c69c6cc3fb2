"""TP-sharded serving engine on the virtual device mesh.

BASELINE.json config 5 ("70B decode on >=2 hosts: KV/heads
tensor-sharded") demands the ENGINE — not just the bare kernel — run
under a mesh. These tests put params on serving_param_shardings, shard
the paged KV pools/tails over tp, and require the sharded engine's
greedy transcripts to EXACTLY match the single-device engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import LlamaConfig, init_params
from flash_attention_tpu.parallel.mesh import make_mesh
from flash_attention_tpu.runtime.engine import Engine, Request

CFG = LlamaConfig.tiny(dtype=jnp.float32)   # n_kv_heads=2 -> tp in {1,2}
PAGE = 128


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def run_engine(params, prompts, n_new, **kw):
    eng = Engine(params, CFG, max_batch=4, num_pages=32, page_size=PAGE,
                 **kw)
    out = eng.run([Request(prompt=p, max_new_tokens=n_new)
                   for p in prompts])
    return {c.prompt_len: c.tokens for c in out}


def _prompts(rng):
    return [
        list(rng.integers(0, CFG.vocab_size, 9)),
        list(rng.integers(0, CFG.vocab_size, 21)),
    ]


def test_sharded_engine_decode_parity(params, rng):
    prompts = _prompts(rng)
    want = run_engine(params, prompts, 6)
    mesh = make_mesh(tp=2, dp=-1)
    got = run_engine(params, prompts, 6, mesh=mesh)
    assert got == want


@pytest.mark.slow
def test_sharded_engine_chunked_paths_parity(params, rng):
    """Sharded engine with chunked prefill AND chunked decode: still
    transcript-identical to the plain single-device engine."""
    prompts = _prompts(rng)
    want = run_engine(params, prompts, 8)
    mesh = make_mesh(tp=2, dp=-1)
    got = run_engine(params, prompts, 8, mesh=mesh, prefill_chunk=16,
                     decode_chunk=4)
    assert got == want


@pytest.mark.slow
def test_sharded_engine_quantized_kv_parity(params, rng):
    """int8 KV pools sharded over tp: transcripts match the unsharded
    int8-KV engine (quantization itself may legitimately perturb vs
    dense, so compare quantized-to-quantized)."""
    prompts = _prompts(rng)
    want = run_engine(params, prompts, 6, kv_quant_dtype=jnp.int8)
    mesh = make_mesh(tp=2, dp=-1)
    got = run_engine(params, prompts, 6, kv_quant_dtype=jnp.int8,
                     mesh=mesh)
    assert got == want


@pytest.mark.parametrize("wdtype", [
    "int4",
    pytest.param(jnp.int8, marks=pytest.mark.slow),
])
def test_sharded_engine_quantized_weights_parity(params, rng, wdtype):
    """TP-sharded engine with QUANTIZED WEIGHT trees (int8 / packed
    int4): expand_param_shardings lays the packed values and scales on
    the same logical axes as the dense serving specs, and the sharded
    engine's greedy transcript must exactly match the single-device
    engine running the SAME quantized tree (BASELINE config 5's 70B
    path runs int4 weights under tp; VERDICT r2 item 1)."""
    from flash_attention_tpu.models.quantized import quantize_params

    qparams = quantize_params(params, dtype=wdtype)
    prompts = _prompts(rng)
    want = run_engine(qparams, prompts, 6)
    mesh = make_mesh(tp=2, dp=-1)
    got = run_engine(qparams, prompts, 6, mesh=mesh)
    assert got == want
