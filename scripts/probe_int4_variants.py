"""int4 nibble-plane unpack variants (VERDICT r4 task 1b).

The shipped int4 kernel runs 1.52x an int8 matmul on HALF the bytes
(ideal would be ~0.65x): the unpack (int32 widen + mask/xor/sub per
nibble + f32 convert + scale mul) costs VPU density. This probe
measures alternative decode formulations at the 8B MLP decode shape
(m=32, 4096x14336) to find the cheapest one:

  v0  shipped int4_matmul (two's-complement nibbles, int32 domain)
  v1  offset-binary nibbles (q+8), FLOAT domain: one u8->f32 convert,
      hi = floor(B/16), lo = B - 16*hi, the -8 offset folded into a
      tiny per-group correction dot (rowsum(x_group) @ 8*sc)
  v2  offset-binary nibbles, int domain: (u & 0xF) - 8 (no xor trick)
  v3  v0 at alternative (block_k, block_f)

Run on the real chip:  PYTHONPATH=. python scripts/probe_int4_variants.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.config import LANES, SUBLANES, round_up
from flash_attention_tpu.ops.quant_matmul import (
    INT4_GROUP, dense_matmul, int4_matmul, quant_matmul,
    quantize_weight, quantize_weight_int4,
)
from flash_attention_tpu.utils.bench import measure

M, K, F = 32, 4096, 14336
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}  shape: [{M},{K}]@[{K},{F}]")

w = rng.normal(0, 0.02, (K, F)).astype(np.float32)
x = jnp.asarray(rng.normal(0, 0.02, (M, K)), jnp.bfloat16)
packed_tc, scales4 = quantize_weight_int4(w)      # two's-complement
q8, s8 = quantize_weight(w)
wbf = jnp.asarray(w, jnp.bfloat16)

# offset-binary packing: nibble = q + 8 in [1, 15]
g = w.reshape(K // INT4_GROUP, INT4_GROUP, F)
sc_np = np.maximum(np.abs(g).max(axis=1) / 7.0, 1e-12)
qv = np.clip(np.round(g / sc_np[:, None, :]), -7, 7).astype(np.int32)
qv = (qv + 8).reshape(K, F)
packed_ob = jnp.asarray(
    ((qv[1::2] << 4) | qv[0::2]).astype(np.uint8).view(np.int8))
rows_per_scale = INT4_GROUP // 2
ns_per_bk = {}


def rep(name, t, nbytes):
    print(f"{name:34s} {t.mean_ms * 1e3:9.1f} us  "
          f"{nbytes / t.mean_s / 1e9:7.1f} GB/s")
    return t.mean_s


def _call(kernel, xe, xo, wp, sc, *, bm, bf, bk, extra=()):
    m, kp2 = xe.shape
    _, f = wp.shape
    nk = kp2 // bk
    ns = bk // rows_per_scale
    return pl.pallas_call(
        functools.partial(kernel, nk=nk),
        grid=(m // bm if m % bm == 0 else -(-m // bm), f // bf, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((ns, bf), lambda i, j, kk: (kk, j)),
        ] + list(extra),
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=False,
    )(xe, xo, wp, sc)


def k_v1_float(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_scr, *, nk):
    """Offset-binary, float-domain decode + correction dot."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xe = xe_ref[...]
    xo = xo_ref[...]
    b = w_ref[...].view(jnp.uint8).astype(jnp.float32)   # [bk, bf]
    hi = jnp.floor(b * (1.0 / 16.0))
    lo = b - hi * 16.0
    bkp, bf = lo.shape
    ns = bkp // rows_per_scale
    sc = s_ref[...]                                       # [ns, bf]
    lo = (lo.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    hi = (hi.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    acc_scr[...] += lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[...] += lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # -8 offset correction: (sum_x_per_group) @ (8 * sc)
    xsum = (xe + xo).reshape(xe.shape[0], ns, rows_per_scale).sum(
        axis=2).astype(jnp.float32)                       # [m, ns]
    acc_scr[...] -= lax.dot_general(
        xsum, sc * 8.0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def k_v2_int(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_scr, *, nk):
    """Offset-binary, int domain: (u & 0xF) - 8, no xor trick."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xe = xe_ref[...]
    xo = xo_ref[...]
    u = w_ref[...].astype(jnp.int32) & 0xFF
    lo = ((u & 0xF) - 8).astype(jnp.float32)
    hi = (((u >> 4) & 0xF) - 8).astype(jnp.float32)
    bkp, bf = lo.shape
    ns = bkp // rows_per_scale
    sc = s_ref[...]
    lo = (lo.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    hi = (hi.reshape(ns, rows_per_scale, bf)
          * sc[:, None, :]).reshape(bkp, bf).astype(xe.dtype)
    acc_scr[...] += lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[...] += lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


scales_j = jnp.asarray(sc_np, jnp.float32)
xe, xo = x[:, 0::2], x[:, 1::2]
xe = jnp.pad(xe, ((0, 0), (0, 0)))
nbytes4 = packed_tc.size + scales4.size * 4

# references / baselines
t = measure(jax.jit(lambda a, b: dense_matmul(a, b)), x, wbf,
            warmup=3, iters=5)
rep("bf16 dense_matmul", t, wbf.size * 2)
t = measure(jax.jit(lambda a, b, c: quant_matmul(a, b, c)), x, q8, s8,
            warmup=3, iters=5)
rep("int8 quant_matmul", t, q8.size + s8.size * 4)
t = measure(jax.jit(lambda a, b, c: int4_matmul(a, b, c)), x,
            packed_tc, scales4, warmup=3, iters=5)
t_v0 = rep("v0 shipped int4_matmul", t, nbytes4)

# exactness check of the variants vs dequant reference
ref = np.asarray(
    x.astype(jnp.float32) @ jnp.asarray(
        (qv.astype(np.float32) - 8.0).reshape(K // INT4_GROUP,
                                              INT4_GROUP, F)
        * sc_np[:, None, :], jnp.float32).reshape(K, F))

for name, kern in (("v1 offset-binary float-domain", k_v1_float),
                   ("v2 offset-binary int-domain", k_v2_int)):
    fn = jax.jit(lambda xe, xo, wp, sc, _k=kern: _call(
        _k, xe, xo, wp, sc, bm=32, bf=1024, bk=1024))
    got = np.asarray(fn(xe, xo, packed_ob, scales_j), np.float32)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    t = measure(fn, xe, xo, packed_ob, scales_j, warmup=3, iters=5)
    rep(f"{name} (rel {err:.1e})", t, nbytes4)

for bk, bf in ((512, 2048), (2048, 512), (1024, 2048), (512, 1024)):
    fn = jax.jit(lambda a, b, c, _bk=bk, _bf=bf: int4_matmul(
        a, b, c, block_k=_bk, block_f=_bf))
    t = measure(fn, x, packed_tc, scales4, warmup=3, iters=5)
    rep(f"v3 shipped bk={bk} bf={bf}", t, nbytes4)
