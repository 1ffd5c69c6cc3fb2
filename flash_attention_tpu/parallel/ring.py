"""Ring attention: sequence-parallel flash attention over a mesh axis.

North-star capability (SURVEY.md §5 "long-context / sequence
parallelism: absent" — net-new vs the reference). Each device holds a
sequence chunk of Q, K, V. K/V chunks rotate around the ring via
`lax.ppermute` while every device accumulates attention of its local Q
chunk against each visiting KV chunk; partial results merge with the
log-sum-exp recurrence — the same online-softmax merge the kernels use
per tile (flashAttention.cu:115-137), applied across devices:

    lse' = logaddexp(lse_a, lse_b)
    o'   = o_a * e^{lse_a - lse'} + o_b * e^{lse_b - lse'}

The function is differentiable (`jax.custom_vjp`): the backward pass is
a second ring in which dK/dV accumulators travel WITH their K/V chunks —
after a full cycle each chunk arrives home carrying the gradient
contributions of every device it visited. This replaces cross-device
atomics the way the single-chip backward replaces `tl.atomic_add`
(FA2-triton.py:165-167): ownership + rotation instead of contention.

Causality across chunks (contiguous layout): device d owns global q
chunk d; the kv chunk visiting at ring step t is src = (d - t) mod n:
  src > d  -> fully masked, skip compute entirely;
  src == d -> the diagonal chunk, causal flash kernel;
  src < d  -> fully visible, non-causal flash kernel.
This is load-imbalanced (device 0 computes 1 chunk, device n-1 computes
n). `layout="zigzag"` fixes it: the global sequence is split into 2n
chunks and device d owns chunks (d, 2n-1-d), so every device does the
work of exactly one full chunk-pair per step (the classic zigzag /
balanced ring assignment). Use `zigzag_order`/`zigzag_inverse` to
permute global arrays into/out of zigzag layout.

Per-step compute uses the single-chip Pallas flash kernels, so the
intra-chunk path is identical to the non-distributed one; XLA overlaps
the `ppermute` with the next step's compute when async collectives are
on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flash_attention_tpu.ops.flash import (
    SegmentIds,
    flash_attention_bwd,
    flash_attention_fwd,
)

LANES = 128


# --- zigzag layout helpers -------------------------------------------------


def zigzag_order(n_seq: int, n_dev: int) -> np.ndarray:
    """Permutation p such that x[..., p, :] is in zigzag layout: the
    sequence splits into 2n chunks and device d's shard is chunks
    (d, 2n-1-d). Apply before sharding over the ring axis."""
    if n_seq % (2 * n_dev):
        raise ValueError(
            f"seq {n_seq} must be divisible by 2*n_dev={2 * n_dev}")
    c = n_seq // (2 * n_dev)
    chunks = np.arange(n_seq).reshape(2 * n_dev, c)
    order = []
    for d in range(n_dev):
        order.append(chunks[d])
        order.append(chunks[2 * n_dev - 1 - d])
    return np.concatenate(order)


def zigzag_inverse(n_seq: int, n_dev: int) -> np.ndarray:
    """Inverse permutation: x_zigzag[..., zigzag_inverse(...), :] is in
    natural order."""
    return np.argsort(zigzag_order(n_seq, n_dev))


# --- forward ----------------------------------------------------------------


def _rotate(t, n_dev, axis_name, perm, arrays):
    """ppermute `arrays` one step around the ring — except after the
    LAST compute step, whose rotation nobody consumes (XLA cannot DCE
    inside fori_loop; for 8 devices with GB-scale KV shards the dead
    rotation is a full extra chunk of ICI traffic per call)."""
    return lax.cond(
        t < n_dev - 1,
        lambda xs: tuple(lax.ppermute(x, axis_name, perm) for x in xs),
        lambda xs: xs,
        arrays,
    )


def _merge(o_acc, lse_acc, o_new, lse_new):
    """LSE-merge two partials (fp32 accumulator). Skipped partials carry
    lse = -inf and contribute weight exactly 0."""
    lse = jnp.logaddexp(lse_acc, lse_new)             # [B,H,N,LANES]
    w_old = jnp.exp(lse_acc - lse)[..., :1]
    w_new = jnp.exp(lse_new - lse)[..., :1]
    o = o_acc * w_old + o_new.astype(jnp.float32) * w_new
    return o, lse


def _skip_like(q):
    b, h, n, _ = q.shape
    return (
        jnp.zeros(q.shape, jnp.float32),
        jnp.full((b, h, n, LANES), -jnp.inf, jnp.float32),
    )


def _seg_or_none(qseg, kvseg):
    return SegmentIds(qseg, kvseg) if qseg is not None else None


def _dummy_seg(k):
    """fori_loop carries must be arrays; un-segmented rings rotate a
    1-element placeholder (negligible ICI traffic)."""
    return jnp.zeros((k.shape[0], 1), jnp.int32)


def _ring_fwd_loop(q, k, v, seg, *, axis_name, causal, layout, window,
                   scale, block_sizes, interpret):
    """Returns (o_f32 [B,H,N,D], lse [B,H,N,LANES]).

    seg: SegmentIds with LOCAL q ids and local kv ids (kv ids rotate
    around the ring with their chunks). window: sliding window in
    GLOBAL positions (causal contiguous layout only — the per-step
    causal offset t*C must be compile-time static for the kernel's
    block skipping, which the statically-unrolled contiguous ring
    provides; zigzag's offsets depend on the device index)."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    kw = dict(scale=scale, block_sizes=block_sizes, interpret=interpret)
    segmented = seg is not None
    qseg = seg.q if segmented else None
    kvseg0 = seg.kv if segmented else _dummy_seg(k)

    def full(q_, k_, v_, qs=None, ks=None):
        o, lse = flash_attention_fwd(
            q_, k_, v_, _seg_or_none(qs, ks), causal=False, **kw)
        return o.astype(jnp.float32), lse

    def diag(q_, k_, v_, qs=None, ks=None):
        o, lse = flash_attention_fwd(
            q_, k_, v_, _seg_or_none(qs, ks), causal=True, offset=0,
            **kw)
        return o.astype(jnp.float32), lse

    o0, lse0 = _skip_like(q)

    if causal and layout == "contiguous" and window is not None:
        # Statically-unrolled windowed ring: at step t the visiting kv
        # chunk (if it is in the causal past, src = my - t >= 0) sits
        # exactly t chunks back, so local causality is `col <= row +
        # t*C` — a static offset the kernel skips blocks against, and
        # the window folds in as `col > row + t*C - window`. Chunks
        # entirely older than the window skip every block (compute AND
        # DMA) inside the kernel.
        c_len = k.shape[2]
        o_acc, lse_acc, k_cur, v_cur, kvseg_cur = o0, lse0, k, v, kvseg0
        for t in range(n_dev):
            def run(q_, k_, v_, ks_, t=t):
                qs = qseg if segmented else None
                ks_ = ks_ if segmented else None
                o, lse = flash_attention_fwd(
                    q_, k_, v_, _seg_or_none(qs, ks_), causal=True,
                    offset=t * c_len, window=window, **kw)
                return o.astype(jnp.float32), lse

            o_t, lse_t = lax.cond(
                my >= t,
                run,
                lambda q_, k_, v_, ks_: _skip_like(q_),
                q, k_cur, v_cur, kvseg_cur,
            )
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
            k_cur, v_cur, kvseg_cur = _rotate(
                t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
        return o_acc, lse_acc

    if not causal:
        def step(t, carry):
            o_acc, lse_acc, k_cur, v_cur, kvseg_cur = carry
            o_t, lse_t = full(q, k_cur, v_cur, qseg,
                              kvseg_cur if segmented else None)
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
            k_cur, v_cur, kvseg_cur = _rotate(
                t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
            return (o_acc, lse_acc, k_cur, v_cur, kvseg_cur)

        o, lse, _, _, _ = lax.fori_loop(
            0, n_dev, step, (o0, lse0, k, v, kvseg0))
        return o, lse

    if layout == "contiguous":
        def step(t, carry):
            o_acc, lse_acc, k_cur, v_cur, kvseg_cur = carry
            src = (my - t) % n_dev
            ks_ = kvseg_cur if segmented else None
            branch = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
            o_t, lse_t = lax.switch(
                branch,
                [lambda q_, k_, v_, qs, ks: _skip_like(q_), diag, full],
                q, k_cur, v_cur, qseg, ks_,
            )
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
            k_cur, v_cur, kvseg_cur = _rotate(
                t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
            return (o_acc, lse_acc, k_cur, v_cur, kvseg_cur)

        o, lse, _, _, _ = lax.fori_loop(
            0, n_dev, step, (o0, lse0, k, v, kvseg0))
        return o, lse

    # --- zigzag: local shard = [chunk a1=my, chunk a2=2n-1-my] -----------
    c = q.shape[2] // 2
    qa1, qa2 = q[:, :, :c], q[:, :, c:]
    qs1 = qseg[:, :c] if segmented else None
    qs2 = qseg[:, c:] if segmented else None

    def step(t, carry):
        o1, l1, o2, l2, k_cur, v_cur, kvseg_cur = carry
        src = (my - t) % n_dev
        kb1, kb2 = k_cur[:, :, :c], k_cur[:, :, c:]
        vb1, vb2 = v_cur[:, :, :c], v_cur[:, :, c:]
        ks1 = kvseg_cur[:, :c] if segmented else None
        ks2 = kvseg_cur[:, c:] if segmented else None

        # a2 = 2n-1-my always sees b1 = src fully (src < n <= a2).
        o_21, l_21 = full(qa2, kb1, vb1, qs2, ks1)
        o2, l2 = _merge(o2, l2, o_21, l_21)

        # (a1,b1): full if src<my, diag if ==, skip if >.
        # (a2,b2): skip if src<my, diag if ==, full if >   (mirror).
        def case_lt(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_, qs1_, qs2_,
                    ks1_, ks2_):
            oa, la = full(qa1_, kb1_, vb1_, qs1_, ks1_)
            ob, lb = _skip_like(qa2_)
            return oa, la, ob, lb

        def case_eq(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_, qs1_, qs2_,
                    ks1_, ks2_):
            oa, la = diag(qa1_, kb1_, vb1_, qs1_, ks1_)
            ob, lb = diag(qa2_, kb2_, vb2_, qs2_, ks2_)
            return oa, la, ob, lb

        def case_gt(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_, qs1_, qs2_,
                    ks1_, ks2_):
            oa, la = _skip_like(qa1_)
            ob, lb = full(qa2_, kb2_, vb2_, qs2_, ks2_)
            return oa, la, ob, lb

        branch = jnp.where(src < my, 0, jnp.where(src == my, 1, 2))
        oa, la, ob, lb = lax.switch(
            branch, [case_lt, case_eq, case_gt],
            qa1, qa2, kb1, vb1, kb2, vb2, qs1, qs2, ks1, ks2,
        )
        o1, l1 = _merge(o1, l1, oa, la)
        o2, l2 = _merge(o2, l2, ob, lb)
        k_cur, v_cur, kvseg_cur = _rotate(
            t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
        return (o1, l1, o2, l2, k_cur, v_cur, kvseg_cur)

    o10, l10 = _skip_like(qa1)
    o20, l20 = _skip_like(qa2)
    o1, l1, o2, l2, _, _, _ = lax.fori_loop(
        0, n_dev, step, (o10, l10, o20, l20, k, v, kvseg0))
    return (jnp.concatenate([o1, o2], axis=2),
            jnp.concatenate([l1, l2], axis=2))


# --- backward ---------------------------------------------------------------


def _ring_bwd_loop(q, k, v, o, lse, do, seg, *, axis_name, causal,
                   layout, window, scale, block_sizes, interpret):
    """dK/dV accumulators rotate with their K/V chunks; dQ stays local.
    kv segment ids rotate alongside so every pair kernel masks exactly
    as its forward counterpart did."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    kw = dict(scale=scale, block_sizes=block_sizes, interpret=interpret)
    segmented = seg is not None
    qseg = seg.q if segmented else None
    kvseg0 = seg.kv if segmented else _dummy_seg(k)

    def pair_bwd(q_, k_, v_, o_, lse_, do_, qs=None, ks=None, *,
                 causal_, offset_=None, window_=None):
        dq_, dk_, dv_ = flash_attention_bwd(
            q_, k_, v_, o_, lse_, do_, _seg_or_none(qs, ks),
            causal=causal_,
            offset=(offset_ if offset_ is not None
                    else (0 if causal_ else None)),
            window=window_, **kw)
        return (dq_.astype(jnp.float32), dk_.astype(jnp.float32),
                dv_.astype(jnp.float32))

    def zeros3(q_, k_):
        return (jnp.zeros(q_.shape, jnp.float32),
                jnp.zeros(k_.shape, jnp.float32),
                jnp.zeros(k_.shape, jnp.float32))

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dkv0 = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))

    if causal and layout == "contiguous" and window is not None:
        # Mirror of the unrolled windowed forward: static offset t*C
        # per step (see _ring_fwd_loop).
        c_len = k.shape[2]
        dq, k_cur, v_cur, kvseg_cur = dq0, k, v, kvseg0
        dk_cur, dv_cur = dkv0
        for t in range(n_dev):
            def run(q_, k_, v_, o_, lse_, do_, ks_, t=t):
                return pair_bwd(
                    q_, k_, v_, o_, lse_, do_,
                    qseg if segmented else None,
                    ks_ if segmented else None,
                    causal_=True, offset_=t * c_len, window_=window)

            dq_t, dk_t, dv_t = lax.cond(
                my >= t,
                run,
                lambda q_, k_, v_, o_, lse_, do_, ks_: zeros3(q_, k_),
                q, k_cur, v_cur, o, lse, do, kvseg_cur,
            )
            dq = dq + dq_t
            dk_cur = dk_cur + dk_t
            dv_cur = dv_cur + dv_t
            k_cur, v_cur, kvseg_cur = _rotate(
                t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
            dk_cur = lax.ppermute(dk_cur, axis_name, perm)
            dv_cur = lax.ppermute(dv_cur, axis_name, perm)
        return dq.astype(q.dtype), dk_cur.astype(k.dtype), \
            dv_cur.astype(v.dtype)

    if not causal or layout == "contiguous":
        def step(t, carry):
            dq, k_cur, v_cur, dk_cur, dv_cur, kvseg_cur = carry
            src = (my - t) % n_dev
            ks_ = kvseg_cur if segmented else None

            if causal:
                branch = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
                dq_t, dk_t, dv_t = lax.switch(
                    branch,
                    [
                        lambda *a: zeros3(a[0], a[1]),
                        functools.partial(pair_bwd, causal_=True),
                        functools.partial(pair_bwd, causal_=False),
                    ],
                    q, k_cur, v_cur, o, lse, do, qseg, ks_,
                )
            else:
                dq_t, dk_t, dv_t = pair_bwd(q, k_cur, v_cur, o, lse, do,
                                            qseg, ks_, causal_=False)
            dq = dq + dq_t
            dk_cur = dk_cur + dk_t
            dv_cur = dv_cur + dv_t
            # dk/dv rotate every step (the last rotation delivers them
            # home); the k/v payloads are dead after the final compute.
            k_cur, v_cur, kvseg_cur = _rotate(
                t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
            return (dq, k_cur, v_cur,
                    lax.ppermute(dk_cur, axis_name, perm),
                    lax.ppermute(dv_cur, axis_name, perm), kvseg_cur)

        dq, _, _, dk, dv, _ = lax.fori_loop(
            0, n_dev, step, (dq0, k, v, *dkv0, kvseg0))
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    # --- zigzag causal backward -----------------------------------------
    c = q.shape[2] // 2
    qa1, qa2 = q[:, :, :c], q[:, :, c:]
    oa1, oa2 = o[:, :, :c], o[:, :, c:]
    la1, la2 = lse[:, :, :c], lse[:, :, c:]
    da1, da2 = do[:, :, :c], do[:, :, c:]
    qs1 = qseg[:, :c] if segmented else None
    qs2 = qseg[:, c:] if segmented else None

    def step(t, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur, kvseg_cur = carry
        src = (my - t) % n_dev
        kb1, kb2 = k_cur[:, :, :c], k_cur[:, :, c:]
        vb1, vb2 = v_cur[:, :, :c], v_cur[:, :, c:]
        ks1 = kvseg_cur[:, :c] if segmented else None
        ks2 = kvseg_cur[:, c:] if segmented else None

        # Always: (a2, b1) full.
        dq2_t, dkb1_t, dvb1_t = pair_bwd(qa2, kb1, vb1, oa2, la2, da2,
                                         qs2, ks1, causal_=False)

        # Conditional pairs, mirroring the forward switch.
        def case_lt(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_, qs1_, qs2_,
             ks1_, ks2_) = args
            dq1, dk1, dv1 = pair_bwd(qa1_, kb1_, vb1_, oa1_, la1_, da1_,
                                     qs1_, ks1_, causal_=False)
            z_dq2, z_dk2, z_dv2 = zeros3(qa2_, kb2_)
            return dq1, dk1, dv1, z_dq2, z_dk2, z_dv2

        def case_eq(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_, qs1_, qs2_,
             ks1_, ks2_) = args
            dq1, dk1, dv1 = pair_bwd(qa1_, kb1_, vb1_, oa1_, la1_, da1_,
                                     qs1_, ks1_, causal_=True)
            dq2, dk2, dv2 = pair_bwd(qa2_, kb2_, vb2_, oa2_, la2_, da2_,
                                     qs2_, ks2_, causal_=True)
            return dq1, dk1, dv1, dq2, dk2, dv2

        def case_gt(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_, qs1_, qs2_,
             ks1_, ks2_) = args
            z_dq1, z_dk1, z_dv1 = zeros3(qa1_, kb1_)
            dq2, dk2, dv2 = pair_bwd(qa2_, kb2_, vb2_, oa2_, la2_, da2_,
                                     qs2_, ks2_, causal_=False)
            return z_dq1, z_dk1, z_dv1, dq2, dk2, dv2

        branch = jnp.where(src < my, 0, jnp.where(src == my, 1, 2))
        dq1_c, dkb1_c, dvb1_c, dq2_c, dkb2_c, dvb2_c = lax.switch(
            branch, [case_lt, case_eq, case_gt],
            (qa1, kb1, vb1, oa1, la1, da1,
             qa2, kb2, vb2, oa2, la2, da2, qs1, qs2, ks1, ks2),
        )

        dq = dq + jnp.concatenate([dq1_c, dq2_t + dq2_c], axis=2)
        dk_cur = dk_cur + jnp.concatenate(
            [dkb1_t + dkb1_c, dkb2_c], axis=2)
        dv_cur = dv_cur + jnp.concatenate(
            [dvb1_t + dvb1_c, dvb2_c], axis=2)
        k_cur, v_cur, kvseg_cur = _rotate(
            t, n_dev, axis_name, perm, (k_cur, v_cur, kvseg_cur))
        return (dq, k_cur, v_cur,
                lax.ppermute(dk_cur, axis_name, perm),
                lax.ppermute(dv_cur, axis_name, perm), kvseg_cur)

    dq, _, _, dk, dv, _ = lax.fori_loop(
        0, n_dev, step, (dq0, k, v, *dkv0, kvseg0))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# --- custom_vjp binding -----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _ring_attention(q, k, v, segment_ids, axis_name, causal, layout,
                    window, scale, block_sizes, interpret):
    o, _ = _ring_fwd_loop(
        q, k, v, segment_ids, axis_name=axis_name, causal=causal,
        layout=layout, window=window, scale=scale,
        block_sizes=block_sizes, interpret=interpret)
    return o.astype(q.dtype)


def _ring_vjp_fwd(q, k, v, segment_ids, axis_name, causal, layout,
                  window, scale, block_sizes, interpret):
    o, lse = _ring_fwd_loop(
        q, k, v, segment_ids, axis_name=axis_name, causal=causal,
        layout=layout, window=window, scale=scale,
        block_sizes=block_sizes, interpret=interpret)
    o = o.astype(q.dtype)
    return o, (q, k, v, segment_ids, o, lse)


def _ring_vjp_bwd(axis_name, causal, layout, window, scale, block_sizes,
                  interpret, res, do):
    q, k, v, segment_ids, o, lse = res
    dq, dk, dv = _ring_bwd_loop(
        q, k, v, o, lse, do, segment_ids, axis_name=axis_name,
        causal=causal, layout=layout, window=window, scale=scale,
        block_sizes=block_sizes, interpret=interpret)
    return dq, dk, dv, None


_ring_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention(q, k, v, segment_ids: SegmentIds | None = None, *,
                   axis_name: str, causal: bool = False,
                   layout: str = "contiguous", window: int | None = None,
                   scale=None, block_sizes=None, interpret=None):
    """Differentiable flash attention with q/k/v sequence-sharded over
    `axis_name`.

    Call inside shard_map with q,k,v chunked on the sequence dim. With
    `layout="contiguous"` the global sequence is the concatenation of
    chunks in axis order; with `layout="zigzag"` (causal only) each
    device holds chunks (d, 2n-1-d) of a 2n-way split — permute global
    arrays with `zigzag_order` first — and per-step causal work is
    perfectly balanced across the ring. Returns the local output chunk
    [B, Hq, N_local, D] in the same layout.

    segment_ids: SegmentIds with the LOCAL q/kv id chunks (shard the
    global id arrays exactly like q/kv); kv ids rotate around the ring
    with their KV chunks, so packed-sequence training composes with
    sequence parallelism.
    window: sliding window in GLOBAL positions (requires causal,
    contiguous layout): the ring unrolls with a static per-step causal
    offset so the kernel's block skipping drops chunks entirely outside
    the window — both compute and DMA.
    """
    if layout not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "zigzag" and q.shape[2] % 2:
        raise ValueError(
            f"zigzag layout needs an even local sequence length (each "
            f"shard is a chunk pair); got {q.shape[2]}")
    if window is not None:
        if not causal:
            raise ValueError("ring window requires causal=True")
        if layout != "contiguous":
            raise NotImplementedError(
                "window requires layout='contiguous' — and that is not "
                "a missing feature: zigzag exists to rebalance the "
                "causal triangle (contiguous per-shard work varies "
                "from C^2/2 to N*C), but a sliding window already "
                "caps every shard's work at ~window*C_local; the "
                "bottleneck shard does irreducible work, so zigzag "
                "cannot improve the windowed ring (only shards whose "
                "global positions < window do less). Contiguous + "
                "window IS the balanced layout here.")
    return _ring_attention(q, k, v, segment_ids, axis_name, causal,
                           layout, window, scale, block_sizes, interpret)


def make_ring_attention(mesh, *, axis_name: str = "sp", causal: bool = False,
                        layout: str = "contiguous",
                        window: int | None = None, segmented: bool = False,
                        qkv_spec=None, **kw):
    """shard_map-wrapped ring attention over `mesh`.

    qkv_spec defaults to sharding the sequence dim (2) over `axis_name`
    and leaving batch/heads replicated; pass a PartitionSpec to change
    (e.g. P("dp", None, "sp", None) to compose with dp/tp).
    With `segmented=True` the returned fn takes (q, k, v, segment_ids)
    where segment_ids holds GLOBAL [B, N] id arrays, sharded over the
    same axis.
    """
    from jax.sharding import PartitionSpec as P

    if qkv_spec is None:
        qkv_spec = P(None, None, axis_name, None)
    seq_axis = (qkv_spec[2] if len(qkv_spec) > 2 else None)
    seg_spec = SegmentIds(P(None, seq_axis), P(None, seq_axis))

    if segmented:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )
        def fn(q, k, v, seg):
            return ring_attention(
                q, k, v, seg, axis_name=axis_name, causal=causal,
                layout=layout, window=window, **kw)

        return fn

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name, causal=causal,
                              layout=layout, window=window, **kw)

    return fn
