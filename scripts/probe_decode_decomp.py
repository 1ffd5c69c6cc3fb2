"""Decompose the 8B int4/int8-KV decode step into measured components.

Round-5 roofline work (VERDICT r4 task 1): the step measured
0.97 ms/layer + 2.1 ms fixed vs a ~0.61 ms/layer bound. This probe
times every component at the exact bench shapes (batch 32, 4K context)
with the slope methodology (utils/bench.measure — sync-jitter immune)
so optimization effort lands where the time actually is.

Run on the real chip:  python scripts/probe_decode_decomp.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.llama import (
    LlamaConfig, decode_step_paged, rmsnorm, rope,
)
from flash_attention_tpu.models.quantized import init_quantized_params
from flash_attention_tpu.ops.paged import paged_flash_decode
from flash_attention_tpu.ops.quant import QUANT_BLOCK
from flash_attention_tpu.ops.quant_matmul import int4_matmul
from flash_attention_tpu.utils.bench import measure

B = 32
CTX = 4096
PS = 256

cfg8 = LlamaConfig.llama3_8b(dtype=jnp.bfloat16)
D, FFN, V = cfg8.dim, cfg8.ffn_dim, cfg8.vocab_size
HQ, HKV, HD = cfg8.n_heads, cfg8.n_kv_heads, cfg8.head_dim

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}")


def rep(name, t, nbytes=None):
    extra = ""
    if nbytes is not None:
        extra = f"  {nbytes / t.mean_s / 1e9:7.1f} GB/s"
    print(f"{name:34s} {t.mean_ms * 1e3:9.1f} us{extra}")
    return t.mean_s


# --- 1. individual int4 matmuls at decode shapes -------------------------
def int4_w(k, f):
    packed = jnp.asarray(
        rng.integers(0, 256, (k // 2, f), np.uint8)).view(jnp.int8)
    scales = jnp.full((k // 128, f), 1e-3, jnp.float32)
    return packed, scales


x_d = jnp.asarray(rng.normal(0, 0.02, (B, D)), jnp.bfloat16)
x_f = jnp.asarray(rng.normal(0, 0.02, (B, FFN)), jnp.bfloat16)

shapes = {
    "wq [4096->4096]": (D, HQ * HD, x_d),
    "wk [4096->1024]": (D, HKV * HD, x_d),
    "w_gate [4096->14336]": (D, FFN, x_d),
    "w_down [14336->4096]": (FFN, D, x_f),
    "lm_head [4096->128256]": (D, V, x_d),
}
t_mm = {}
for name, (k, f, x) in shapes.items():
    packed, scales = int4_w(k, f)
    fn = jax.jit(lambda x, p, s: int4_matmul(x, p, s))
    t = measure(fn, x, packed, scales, warmup=3, iters=5)
    nbytes = packed.size + scales.size * 4
    t_mm[name] = rep(f"int4 {name}", t, nbytes)

per_layer_mm = (t_mm["wq [4096->4096]"] * 2      # wq + wo
                + t_mm["wk [4096->1024]"] * 2    # wk + wv
                + t_mm["w_gate [4096->14336]"] * 2
                + t_mm["w_down [14336->4096]"])
print(f"{'  => per-layer weight matmuls':34s} {per_layer_mm * 1e6:9.1f} us")

# --- 2. paged attention, int8 KV -----------------------------------------
max_pages = CTX // PS
num_pages = B * max_pages
pool_shape = (HKV, num_pages, PS, HD)
kq = jnp.asarray(rng.integers(-127, 127, pool_shape, np.int8))
vq = jnp.asarray(rng.integers(-127, 127, pool_shape, np.int8))
ksc = jnp.full((HKV, num_pages, PS // QUANT_BLOCK, HD), 1e-3, jnp.float32)
vsc = jnp.full_like(ksc, 1e-3)
tbl = jnp.asarray(np.arange(B * max_pages).reshape(B, max_pages), jnp.int32)
lens = jnp.full((B,), CTX - 8, jnp.int32)
q = jnp.asarray(rng.normal(0, 0.02, (B, HQ, HD)), jnp.bfloat16)

pfd = jax.jit(functools.partial(paged_flash_decode, return_lse=True))
t = measure(pfd, q, kq, vq, tbl, lens, k_scales=ksc, v_scales=vsc,
            warmup=3, iters=5)
kv_bytes = 2 * B * HKV * (CTX - 8) * HD  # int8
t_attn = rep("paged attn int8 [B32,4K]", t, kv_bytes)

pfd2 = jax.jit(functools.partial(paged_flash_decode, return_lse=True))
kb = jnp.asarray(rng.normal(0, 0.02, pool_shape), jnp.bfloat16)
vb = jnp.asarray(rng.normal(0, 0.02, pool_shape), jnp.bfloat16)
t = measure(pfd2, q, kb, vb, tbl, lens, warmup=3, iters=5)
t_attn_bf16 = rep("paged attn bf16 [B32,4K]", t, kv_bytes * 2)

# --- 3. per-layer glue (everything but matmuls + paged attn) -------------
TAIL = 128
kt = jnp.zeros((B, HKV, TAIL, HD), jnp.bfloat16)
vt = jnp.zeros((B, HKV, TAIL, HD), jnp.bfloat16)
norm_w = jnp.ones((D,), jnp.bfloat16)
tail_pos = jnp.full((B,), 5, jnp.int32)
positions = jnp.full((B, 1), CTX - 3, jnp.int32)


@jax.jit
def glue(x, kt, vt, q, k, v, o_p, lse_p):
    """The non-matmul, non-paged work of one layer: 2 rmsnorms, rope
    q/k, tail scatter, tail attention + LSE merge."""
    from flash_attention_tpu.models.llama import _tail_attention

    h = rmsnorm(x, norm_w, 1e-5)
    qr = rope(q, positions, cfg8.rope_theta)
    kr = rope(k, positions, cfg8.rope_theta)
    bidx = jnp.arange(B)
    trow = tail_pos[:, None] + jnp.arange(1)[None, :]
    kt = kt.at[bidx[:, None], :, trow, :].set(
        jnp.moveaxis(kr, 1, 2).astype(kt.dtype))
    vt = vt.at[bidx[:, None], :, trow, :].set(
        jnp.moveaxis(v, 1, 2).astype(vt.dtype))
    qg = qr.reshape(B, HKV, HQ // HKV, 1, HD)
    o_t, lse_t = _tail_attention(qg, kt, vt, tail_pos, 1.0 / np.sqrt(HD))
    lse = jnp.logaddexp(lse_p, lse_t)
    o = (o_p * jnp.exp(lse_p - lse)[..., None]
         + o_t * jnp.exp(lse_t - lse)[..., None])
    h2 = rmsnorm(x, norm_w, 1e-5)
    return h, o, kt, vt, h2


qh = jnp.asarray(rng.normal(0, 0.02, (B, HQ, 1, HD)), jnp.bfloat16)
kh = jnp.asarray(rng.normal(0, 0.02, (B, HKV, 1, HD)), jnp.bfloat16)
o_p = jnp.zeros((B, HKV, HQ // HKV, 1, HD), jnp.float32)
lse_p = jnp.zeros((B, HKV, HQ // HKV, 1), jnp.float32)
t = measure(glue, x_d, kt, vt, qh, kh, kh, o_p, lse_p, warmup=3, iters=5)
t_glue = rep("glue (norms/rope/tail/merge)", t)

# --- 4. head: embed + final norm + lm_head + argmax ----------------------
lm_packed, lm_scales = int4_w(D, V)
embed = jnp.asarray(rng.normal(0, 0.02, (V, D)), jnp.bfloat16)
tok = jnp.zeros((B,), jnp.int32)


@jax.jit
def head_full(tok, x):
    h = rmsnorm(x, norm_w, 1e-5)
    logits = int4_matmul(h, lm_packed, lm_scales)
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return nxt, embed[tok]


t = measure(head_full, tok, x_d, warmup=3, iters=5)
t_head = rep("head (norm+lm_head+argmax+embed)", t)

logits_b = jnp.asarray(rng.normal(0, 1, (B, V)), jnp.bfloat16)
t = measure(jax.jit(lambda lg: jnp.argmax(lg, -1)), logits_b,
            warmup=3, iters=5)
t_argmax = rep("argmax [32,128256] alone", t)

# --- 5. whole-step layer slope -------------------------------------------
def step_time(L):
    cfg = LlamaConfig.llama3_8b(dtype=jnp.bfloat16, n_layers=L)
    params = init_quantized_params(cfg, jax.random.PRNGKey(0),
                                   dtype="int4")
    kp = [kq] * L
    vp = [vq] * L
    ktl = [jnp.zeros((B, HKV, TAIL, HD), jnp.bfloat16) for _ in range(L)]
    vtl = [jnp.zeros((B, HKV, TAIL, HD), jnp.bfloat16) for _ in range(L)]
    kscl = [ksc] * L
    vscl = [vsc] * L

    @jax.jit
    def step(params, tok, ktl, vtl):
        logits, ktl, vtl = decode_step_paged(
            params, tok, cfg, kp, vp, ktl, vtl, tbl, lens,
            jnp.zeros((B,), jnp.int32), k_scales=kscl, v_scales=vscl)
        return jnp.argmax(logits, -1).astype(jnp.int32), ktl, vtl

    t = measure(step, params, tok, ktl, vtl, warmup=3, iters=5)
    rep(f"full step L={L}", t)
    return t.mean_s


t2 = step_time(2)
t8 = step_time(8)
slope = (t8 - t2) / 6
fixed = t2 - 2 * slope
print()
print(f"layer slope: {slope * 1e6:.1f} us/layer   fixed: "
      f"{fixed * 1e6:.1f} us")
print(f"accounted per-layer: matmuls {per_layer_mm * 1e6:.1f} + attn "
      f"{t_attn * 1e6:.1f} + glue {t_glue * 1e6:.1f} = "
      f"{(per_layer_mm + t_attn + t_glue) * 1e6:.1f} us")
print(f"accounted fixed: head {t_head * 1e6:.1f} us")
