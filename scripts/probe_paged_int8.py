"""int8 paged-decode dequant-stream variants (VERDICT r4 task 1a).

The int8 paged kernel reads KV at ~548 GB/s vs 757 bf16 — the named
cost is the int8->bf16 convert feeding the MXU. Variants measured at
the bench shape (batch 64, 32q/8kv, D=128, ctx 4096, page 256):

  v0  shipped quantized path (whole-page tile_to_f32 + scale mul)
  v1  fold_scales shipped variant (per-block dots, scales outside MXU)
  v2  per-QUANT_BLOCK convert+dot on BOTH sides: convert 128 rows at a
      time so Mosaic can overlap each block's convert with the previous
      block's MXU dot (the whole-page convert serializes ahead of the
      first dot)
  v3  shipped path at page_size 512 (fewer grid steps, fatter DMA)

Run on the real chip:  PYTHONPATH=. python scripts/probe_paged_int8.py
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.config import LANES
from flash_attention_tpu.ops.flash import INIT_M, LOG2E, MASK_VALUE
from flash_attention_tpu.ops.paged import (
    paged_decode_reference, paged_flash_decode,
)
from flash_attention_tpu.ops.quant import QUANT_BLOCK
from flash_attention_tpu.utils.bench import measure

B, HQ, HKV, D, CTX = 64, 32, 8, 128, 4096
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"device: {dev.device_kind}  B={B} {HQ}q/{HKV}kv D={D} ctx={CTX}")


def make_pools(ps):
    mp = CTX // ps
    npages = B * mp
    shape = (HKV, npages, ps, D)
    kf = rng.normal(0, 0.02, shape).astype(np.float32)
    vf = rng.normal(0, 0.02, shape).astype(np.float32)

    def quant(x):
        xr = x.reshape(HKV, npages, ps // QUANT_BLOCK, QUANT_BLOCK, D)
        sc = np.maximum(np.abs(xr).max(axis=3, keepdims=True) / 127.0,
                        1e-8)
        q = np.clip(np.round(xr / sc), -127, 127).astype(np.int8)
        return (jnp.asarray(q.reshape(shape)),
                jnp.asarray(sc[..., 0, :], jnp.float32))

    kq, ksc = quant(kf)
    vq, vsc = quant(vf)
    tbl = jnp.asarray(
        rng.permutation(npages)[: B * mp].reshape(B, mp), jnp.int32)
    lens = jnp.full((B,), CTX - 8, jnp.int32)
    return kq, vq, ksc, vsc, tbl, lens


q = jnp.asarray(rng.normal(0, 0.02, (B, HQ, D)), jnp.bfloat16)
kv_bytes = 2 * B * HKV * (CTX - 8) * D


def rep(name, t):
    print(f"{name:40s} {t.mean_ms * 1e3:9.1f} us  "
          f"{kv_bytes / t.mean_s / 1e9:7.1f} GB/s KV")
    return t.mean_s


# --- v2 kernel: blocked convert+dot on both sides ------------------------
def _v2_kernel(lengths_ref, starts_ref, pt_ref, q_ref, k_ref, v_ref,
               kscale_ref, vscale_ref, o_ref, m_scr, l_scr, acc_scr, *,
               scale, page_size, max_pages):
    b, p = pl.program_id(0), pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(p * page_size < length)
    def _compute():
        qv = q_ref[0]                                # [Hkv, G, D]
        nb = page_size // QUANT_BLOCK
        parts = []
        for bi in range(nb):
            lo = bi * QUANT_BLOCK
            kb = (k_ref[:, 0, lo:lo + QUANT_BLOCK].astype(jnp.float32)
                  * kscale_ref[:, 0, bi][:, None, :]).astype(qv.dtype)
            parts.append(lax.dot_general(
                qv, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        s = jnp.concatenate(parts, axis=2)           # [Hkv, G, ps]
        col = lax.broadcasted_iota(jnp.int32, s.shape, 2) + p * page_size
        s = jnp.where(col >= length, MASK_VALUE, s)
        c = scale * LOG2E
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_new = jnp.maximum(
            m_prev, jnp.broadcast_to(
                jnp.max(s, axis=2, keepdims=True), m_prev.shape))
        alpha = jnp.exp2((m_prev - m_new) * c)
        pr = jnp.exp2((s - m_new[:, :, :1]) * c)
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(pr, axis=2, keepdims=True), l_prev.shape)
        m_scr[...] = m_new
        pv = jnp.zeros_like(acc_scr[...])
        for bi in range(nb):
            lo = bi * QUANT_BLOCK
            vb = (v_ref[:, 0, lo:lo + QUANT_BLOCK].astype(jnp.float32)
                  * vscale_ref[:, 0, bi][:, None, :]).astype(qv.dtype)
            pv = pv + lax.dot_general(
                pr[:, :, lo:lo + QUANT_BLOCK].astype(vb.dtype), vb,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + pv

    @pl.when(p == max_pages - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe[:, :, :1]).astype(o_ref.dtype)


def v2_call(q, kq, vq, ksc, vsc, tbl, lens, ps):
    batch, hq, d = q.shape
    group = hq // HKV
    mp = tbl.shape[1]
    scale = float(1.0 / np.sqrt(d))

    def q_index(b, p, lens_, st, pt):
        return (b, 0, 0, 0)

    def pool_index(b, p, lens_, st, pt):
        run = p * ps < lens_[b]
        return (0, pt[b, lax.select(run, p, 0)], 0, 0)

    return pl.pallas_call(
        functools.partial(_v2_kernel, scale=scale, page_size=ps,
                          max_pages=mp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, mp),
            in_specs=[
                pl.BlockSpec((1, HKV, group, d), q_index),
                pl.BlockSpec((HKV, 1, ps, d), pool_index),
                pl.BlockSpec((HKV, 1, ps, d), pool_index),
                pl.BlockSpec((HKV, 1, ps // QUANT_BLOCK, d), pool_index),
                pl.BlockSpec((HKV, 1, ps // QUANT_BLOCK, d), pool_index),
            ],
            out_specs=[pl.BlockSpec((1, HKV, group, d), q_index)],
            scratch_shapes=[
                pltpu.VMEM((HKV, group, LANES), jnp.float32),
                pltpu.VMEM((HKV, group, LANES), jnp.float32),
                pltpu.VMEM((HKV, group, d), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((batch, HKV, group, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=False,
    )(lens, jnp.zeros_like(lens), tbl,
      q.reshape(batch, HKV, group, d), kq, vq, ksc, vsc
      )[0].reshape(batch, hq, d)


for ps in (256, 512):
    kq, vq, ksc, vsc, tbl, lens = make_pools(ps)
    v0 = jax.jit(lambda q, kq, vq, t, l, ks=ksc, vs=vsc:
                 paged_flash_decode(q, kq, vq, t, l, k_scales=ks,
                                    v_scales=vs))
    t = measure(v0, q, kq, vq, tbl, lens, warmup=3, iters=5)
    rep(f"v0 shipped int8 (page {ps})", t)
    if ps == 256:
        v1 = jax.jit(lambda q, kq, vq, t, l, ks=ksc, vs=vsc:
                     paged_flash_decode(q, kq, vq, t, l, k_scales=ks,
                                        v_scales=vs, fold_scales=True))
        t = measure(v1, q, kq, vq, tbl, lens, warmup=3, iters=5)
        rep("v1 fold_scales (page 256)", t)
        v2 = jax.jit(lambda q, kq, vq, t, l, ks=ksc, vs=vsc, _p=ps:
                     v2_call(q, kq, vq, ks, vs, t, l, _p))
        # correctness
        want = np.asarray(paged_decode_reference(
            q, kq, vq, tbl, lens, k_scales=ksc, v_scales=vsc),
            np.float32)
        got = np.asarray(v2(q, kq, vq, tbl, lens), np.float32)
        err = np.max(np.abs(got - want))
        t = measure(v2, q, kq, vq, tbl, lens, warmup=3, iters=5)
        rep(f"v2 blocked convert+dot (maxabs {err:.1e})", t)
