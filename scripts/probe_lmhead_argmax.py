"""Fused int4 lm_head + greedy argmax (VERDICT r4 task 1c).

The 8B decode step carries a ~2.1 ms fixed head (embed + int4 lm_head
+ argmax). For greedy rows the [B, 128K] logits never need to exist:
this probe measures a vocab-chunked kernel that keeps a running
(max, argmax) in scratch while streaming the packed lm_head — vs the
shipped int4_matmul followed by a separate argmax.

Run on the real chip:  PYTHONPATH=. python scripts/probe_lmhead_argmax.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.config import LANES, round_up
from flash_attention_tpu.ops.quant_matmul import (
    INT4_GROUP, int4_matmul, quantize_weight_int4,
)
from flash_attention_tpu.utils.bench import measure

M, K, V = 32, 4096, 128256
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}  lm_head [{M},{K}]@[{K},{V}]")

w = rng.normal(0, 0.02, (K, V)).astype(np.float32)
x = jnp.asarray(rng.normal(0, 0.5, (M, K)), jnp.bfloat16)
packed, scales = quantize_weight_int4(w)
rows_per_scale = INT4_GROUP // 2
nbytes = packed.size + scales.size * 4


def _fused_kernel(xe_ref, xo_ref, w_ref, s_ref, id_ref, val_ref,
                  acc_scr, best_scr, idx_scr, *, nk, nf, bf):
    j, kk = pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, kk == 0))
    def _init0():
        best_scr[...] = jnp.full_like(best_scr, -jnp.inf)
        idx_scr[...] = jnp.zeros_like(idx_scr)

    @pl.when(kk == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xe = xe_ref[...]
    xo = xo_ref[...]
    u = w_ref[...].astype(jnp.int32) & 0xFF
    lo = (((u & 0xF) ^ 8) - 8).astype(jnp.float32)
    hi = ((((u >> 4) & 0xF) ^ 8) - 8).astype(jnp.float32)
    bkp, bfv = lo.shape
    ns = bkp // rows_per_scale
    sc = s_ref[...]
    lo = (lo.reshape(ns, rows_per_scale, bfv)
          * sc[:, None, :]).reshape(bkp, bfv).astype(xe.dtype)
    hi = (hi.reshape(ns, rows_per_scale, bfv)
          * sc[:, None, :]).reshape(bkp, bfv).astype(xe.dtype)
    acc_scr[...] += lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[...] += lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _reduce():
        tile = acc_scr[...]                              # [bm, bf]
        tmax = jnp.max(tile, axis=1, keepdims=True)      # [bm, 1]
        targ = jnp.argmax(tile, axis=1)[:, None] + j * bf
        better = tmax > best_scr[:, :1]
        best_scr[...] = jnp.where(
            jnp.broadcast_to(better, best_scr.shape),
            jnp.broadcast_to(tmax, best_scr.shape), best_scr[...])
        idx_scr[...] = jnp.where(
            jnp.broadcast_to(better, idx_scr.shape),
            jnp.broadcast_to(targ.astype(jnp.int32), idx_scr.shape),
            idx_scr[...])

        @pl.when(j == nf - 1)
        def _store():
            id_ref[...] = idx_scr[...]
            val_ref[...] = best_scr[...]


@functools.partial(jax.jit, static_argnames=("bf", "bk"))
def fused_argmax(x, packed, scales, *, bf=2048, bk=1024):
    m, k = x.shape
    kp2, v = packed.shape
    xe, xo = x[:, 0::2], x[:, 1::2]
    vp = round_up(v, bf)
    if vp != v:
        # Pad with the packed encoding of 0 (byte 0x88 = nibbles -8/-8
        # would be wrong; 0 value nibbles = 0x00 ^ ... value 0 packs as
        # ((0^8)-8 ... byte 0 decodes to (0^8)-8 = -8?? No: lo=(0^8)-8
        # = 0? (0 & 0xF)=0; 0^8=8; 8-8=0. Byte 0 decodes to (0, 0).)
        packed = jnp.pad(packed, ((0, 0), (0, vp - v)))
        scales = jnp.pad(scales, ((0, 0), (0, vp - v)))
        # Padded logits = 0; real rows of a trained/scaled lm_head at
        # |logits| >> 0 win, but guard anyway by masking in-caller:
        # here we accept the probe approximation (V % bf == 0 for 8B
        # vocab 128256 with bf=2048? 128256/2048 = 62.625 -> padded).
    nf = vp // bf
    nk = kp2 // bk
    ns = bk // rows_per_scale
    outs = pl.pallas_call(
        functools.partial(_fused_kernel, nk=nk, nf=nf, bf=bf),
        grid=(1, nf, nk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j, kk: (0, kk)),
            pl.BlockSpec((m, bk), lambda i, j, kk: (0, kk)),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((ns, bf), lambda i, j, kk: (kk, j)),
        ],
        out_specs=[
            pl.BlockSpec((m, LANES), lambda i, j, kk: (0, 0)),
            pl.BlockSpec((m, LANES), lambda i, j, kk: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, bf), jnp.float32),
            pltpu.VMEM((m, LANES), jnp.float32),
            pltpu.VMEM((m, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=False,
    )(xe, xo, packed, scales)
    return outs[0][:, 0], outs[1][:, 0]


def rep(name, t):
    print(f"{name:40s} {t.mean_ms * 1e3:9.1f} us  "
          f"{nbytes / t.mean_s / 1e9:7.1f} GB/s")


# baseline: shipped matmul + separate argmax
base = jax.jit(lambda x, p, s: jnp.argmax(int4_matmul(x, p, s), -1))
ids_base = np.asarray(base(x, packed, scales))
t = measure(base, x, packed, scales, warmup=3, iters=5)
rep("int4_matmul + argmax (shipped)", t)

ids_f, vals_f = fused_argmax(x, packed, scales)
ids_f = np.asarray(ids_f)
agree = float(np.mean(ids_f == ids_base))
t = measure(lambda x, p, s: fused_argmax(x, p, s)[0], x, packed, scales,
            warmup=3, iters=5)
rep(f"fused matmul+argmax (agree {agree:.3f})", t)
for bf in (1024, 4096):
    t = measure(lambda x, p, s, _bf=bf: fused_argmax(
        x, p, s, bf=_bf)[0], x, packed, scales, warmup=3, iters=5)
    rep(f"fused bf={bf}", t)
