"""Small-dispatch prefill bandwidth cliff (VERDICT r4 task 4).

REPORT "Known headroom": a [1, 256] chunked-prefill dispatch measured
~30 ms vs the ~4 ms weight-read bound — the weight stream runs ~8x
under HBM speed. This probe isolates WHERE: individual small-m dense
einsums at 1B shapes, the full prefill_chunk_step, and a Pallas
weight-streaming dense matmul (same blocked structure that carries the
int8 kernel to 518 GB/s at m=16) as the candidate fix.

Run on the real chip:  PYTHONPATH=. python scripts/probe_prefill_cliff.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from flash_attention_tpu.models.llama import (
    LlamaConfig, init_params, prefill_chunk_step,
)
from flash_attention_tpu.ops.quant_matmul import dense_matmul
from flash_attention_tpu.utils.bench import measure

cfg = LlamaConfig.llama3_1b(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}")


def rep(name, t, nbytes=None):
    extra = ""
    if nbytes is not None:
        extra = f"  {nbytes / t.mean_s / 1e9:7.1f} GB/s weight stream"
    print(f"{name:44s} {t.mean_ms * 1e3:9.1f} us{extra}")
    return t.mean_s


# --- 1. isolated dense matmuls at prefill-chunk shapes -------------------
for m in (16, 256, 1024, 4096):
    x = jnp.asarray(rng.normal(0, 0.02, (m, cfg.dim)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, (cfg.dim, cfg.ffn_dim)),
                    jnp.bfloat16)
    t = measure(jax.jit(lambda x, w: x @ w), x, w, warmup=3, iters=5)
    rep(f"XLA einsum [{m},2048]@[2048,8192]", t, w.size * 2)
    t = measure(jax.jit(lambda x, w: dense_matmul(x, w)), x, w,
                warmup=3, iters=5)
    rep(f"pallas dense [{m},2048]@[2048,8192]", t, w.size * 2)

# --- 2. the full chunk dispatch ------------------------------------------
params = init_params(cfg, jax.random.PRNGKey(0))
w_bytes = sum(x.size * x.dtype.itemsize
              for x in jax.tree.leaves(params))
L, HKV, D = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
for g, chunk, tb in ((1, 256, 1024), (4, 256, 1024), (8, 256, 1024)):
    toks = jnp.zeros((g, chunk), jnp.int32)
    kb = jnp.zeros((L, g, HKV, tb, D), jnp.bfloat16)
    vb = jnp.zeros((L, g, HKV, tb, D), jnp.bfloat16)
    fn = jax.jit(functools.partial(prefill_chunk_step, cfg=cfg))

    def run(params, toks, kb, vb):
        return prefill_chunk_step(
            params, toks, cfg, kb, vb,
            jnp.zeros((g,), jnp.int32), jnp.full((g,), chunk, jnp.int32))

    t = measure(jax.jit(run), params, toks, kb, vb, warmup=3, iters=5)
    rep(f"prefill_chunk_step g={g} chunk={chunk}", t, w_bytes)
