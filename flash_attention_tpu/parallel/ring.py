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


def _ring_fwd_loop(q, k, v, *, axis_name, causal, layout, scale,
                   block_sizes, interpret):
    """Returns (o_f32 [B,H,N,D], lse [B,H,N,LANES])."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    kw = dict(scale=scale, block_sizes=block_sizes, interpret=interpret)

    def full(q_, k_, v_):
        o, lse = flash_attention_fwd(q_, k_, v_, causal=False, **kw)
        return o.astype(jnp.float32), lse

    def diag(q_, k_, v_):
        o, lse = flash_attention_fwd(q_, k_, v_, causal=True, offset=0, **kw)
        return o.astype(jnp.float32), lse

    o0, lse0 = _skip_like(q)

    if not causal:
        def step(t, carry):
            o_acc, lse_acc, k_cur, v_cur = carry
            o_t, lse_t = full(q, k_cur, v_cur)
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
            k_cur, v_cur = _rotate(t, n_dev, axis_name, perm,
                                   (k_cur, v_cur))
            return (o_acc, lse_acc, k_cur, v_cur)

        o, lse, _, _ = lax.fori_loop(0, n_dev, step, (o0, lse0, k, v))
        return o, lse

    if layout == "contiguous":
        def step(t, carry):
            o_acc, lse_acc, k_cur, v_cur = carry
            src = (my - t) % n_dev
            branch = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
            o_t, lse_t = lax.switch(
                branch,
                [lambda q_, k_, v_: _skip_like(q_), diag, full],
                q, k_cur, v_cur,
            )
            o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
            k_cur, v_cur = _rotate(t, n_dev, axis_name, perm,
                                   (k_cur, v_cur))
            return (o_acc, lse_acc, k_cur, v_cur)

        o, lse, _, _ = lax.fori_loop(0, n_dev, step, (o0, lse0, k, v))
        return o, lse

    # --- zigzag: local shard = [chunk a1=my, chunk a2=2n-1-my] -----------
    c = q.shape[2] // 2
    qa1, qa2 = q[:, :, :c], q[:, :, c:]

    def step(t, carry):
        o1, l1, o2, l2, k_cur, v_cur = carry
        src = (my - t) % n_dev
        kb1, kb2 = k_cur[:, :, :c], k_cur[:, :, c:]
        vb1, vb2 = v_cur[:, :, :c], v_cur[:, :, c:]

        # a2 = 2n-1-my always sees b1 = src fully (src < n <= a2).
        o_21, l_21 = full(qa2, kb1, vb1)
        o2, l2 = _merge(o2, l2, o_21, l_21)

        # (a1,b1): full if src<my, diag if ==, skip if >.
        # (a2,b2): skip if src<my, diag if ==, full if >   (mirror).
        def case_lt(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_):
            oa, la = full(qa1_, kb1_, vb1_)
            ob, lb = _skip_like(qa2_)
            return oa, la, ob, lb

        def case_eq(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_):
            oa, la = diag(qa1_, kb1_, vb1_)
            ob, lb = diag(qa2_, kb2_, vb2_)
            return oa, la, ob, lb

        def case_gt(qa1_, qa2_, kb1_, vb1_, kb2_, vb2_):
            oa, la = _skip_like(qa1_)
            ob, lb = full(qa2_, kb2_, vb2_)
            return oa, la, ob, lb

        branch = jnp.where(src < my, 0, jnp.where(src == my, 1, 2))
        oa, la, ob, lb = lax.switch(
            branch, [case_lt, case_eq, case_gt],
            qa1, qa2, kb1, vb1, kb2, vb2,
        )
        o1, l1 = _merge(o1, l1, oa, la)
        o2, l2 = _merge(o2, l2, ob, lb)
        k_cur, v_cur = _rotate(t, n_dev, axis_name, perm, (k_cur, v_cur))
        return (o1, l1, o2, l2, k_cur, v_cur)

    o10, l10 = _skip_like(qa1)
    o20, l20 = _skip_like(qa2)
    o1, l1, o2, l2, _, _ = lax.fori_loop(
        0, n_dev, step, (o10, l10, o20, l20, k, v))
    return (jnp.concatenate([o1, o2], axis=2),
            jnp.concatenate([l1, l2], axis=2))


# --- backward ---------------------------------------------------------------


def _ring_bwd_loop(q, k, v, o, lse, do, *, axis_name, causal, layout,
                   scale, block_sizes, interpret):
    """dK/dV accumulators rotate with their K/V chunks; dQ stays local."""
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    kw = dict(scale=scale, block_sizes=block_sizes, interpret=interpret)

    def pair_bwd(q_, k_, v_, o_, lse_, do_, *, causal_):
        dq_, dk_, dv_ = flash_attention_bwd(
            q_, k_, v_, o_, lse_, do_,
            causal=causal_, offset=0 if causal_ else None, **kw)
        return (dq_.astype(jnp.float32), dk_.astype(jnp.float32),
                dv_.astype(jnp.float32))

    def zeros3(q_, k_):
        return (jnp.zeros(q_.shape, jnp.float32),
                jnp.zeros(k_.shape, jnp.float32),
                jnp.zeros(k_.shape, jnp.float32))

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dkv0 = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))

    if not causal or layout == "contiguous":
        def step(t, carry):
            dq, k_cur, v_cur, dk_cur, dv_cur = carry
            src = (my - t) % n_dev

            if causal:
                branch = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
                dq_t, dk_t, dv_t = lax.switch(
                    branch,
                    [
                        lambda *a: zeros3(a[0], a[1]),
                        functools.partial(pair_bwd, causal_=True),
                        functools.partial(pair_bwd, causal_=False),
                    ],
                    q, k_cur, v_cur, o, lse, do,
                )
            else:
                dq_t, dk_t, dv_t = pair_bwd(q, k_cur, v_cur, o, lse, do,
                                            causal_=False)
            dq = dq + dq_t
            dk_cur = dk_cur + dk_t
            dv_cur = dv_cur + dv_t
            # dk/dv rotate every step (the last rotation delivers them
            # home); the k/v payloads are dead after the final compute.
            k_cur, v_cur = _rotate(t, n_dev, axis_name, perm,
                                   (k_cur, v_cur))
            return (dq, k_cur, v_cur,
                    lax.ppermute(dk_cur, axis_name, perm),
                    lax.ppermute(dv_cur, axis_name, perm))

        dq, _, _, dk, dv = lax.fori_loop(
            0, n_dev, step, (dq0, k, v, *dkv0))
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    # --- zigzag causal backward -----------------------------------------
    c = q.shape[2] // 2
    qa1, qa2 = q[:, :, :c], q[:, :, c:]
    oa1, oa2 = o[:, :, :c], o[:, :, c:]
    la1, la2 = lse[:, :, :c], lse[:, :, c:]
    da1, da2 = do[:, :, :c], do[:, :, c:]

    def step(t, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        src = (my - t) % n_dev
        kb1, kb2 = k_cur[:, :, :c], k_cur[:, :, c:]
        vb1, vb2 = v_cur[:, :, :c], v_cur[:, :, c:]

        # Always: (a2, b1) full.
        dq2_t, dkb1_t, dvb1_t = pair_bwd(qa2, kb1, vb1, oa2, la2, da2,
                                         causal_=False)

        # Conditional pairs, mirroring the forward switch.
        def case_lt(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_) = args
            dq1, dk1, dv1 = pair_bwd(qa1_, kb1_, vb1_, oa1_, la1_, da1_,
                                     causal_=False)
            z_dq2, z_dk2, z_dv2 = zeros3(qa2_, kb2_)
            return dq1, dk1, dv1, z_dq2, z_dk2, z_dv2

        def case_eq(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_) = args
            dq1, dk1, dv1 = pair_bwd(qa1_, kb1_, vb1_, oa1_, la1_, da1_,
                                     causal_=True)
            dq2, dk2, dv2 = pair_bwd(qa2_, kb2_, vb2_, oa2_, la2_, da2_,
                                     causal_=True)
            return dq1, dk1, dv1, dq2, dk2, dv2

        def case_gt(args):
            (qa1_, kb1_, vb1_, oa1_, la1_, da1_,
             qa2_, kb2_, vb2_, oa2_, la2_, da2_) = args
            z_dq1, z_dk1, z_dv1 = zeros3(qa1_, kb1_)
            dq2, dk2, dv2 = pair_bwd(qa2_, kb2_, vb2_, oa2_, la2_, da2_,
                                     causal_=False)
            return z_dq1, z_dk1, z_dv1, dq2, dk2, dv2

        branch = jnp.where(src < my, 0, jnp.where(src == my, 1, 2))
        dq1_c, dkb1_c, dvb1_c, dq2_c, dkb2_c, dvb2_c = lax.switch(
            branch, [case_lt, case_eq, case_gt],
            (qa1, kb1, vb1, oa1, la1, da1,
             qa2, kb2, vb2, oa2, la2, da2),
        )

        dq = dq + jnp.concatenate([dq1_c, dq2_t + dq2_c], axis=2)
        dk_cur = dk_cur + jnp.concatenate(
            [dkb1_t + dkb1_c, dkb2_c], axis=2)
        dv_cur = dv_cur + jnp.concatenate(
            [dvb1_t + dvb1_c, dvb2_c], axis=2)
        k_cur, v_cur = _rotate(t, n_dev, axis_name, perm, (k_cur, v_cur))
        return (dq, k_cur, v_cur,
                lax.ppermute(dk_cur, axis_name, perm),
                lax.ppermute(dv_cur, axis_name, perm))

    dq, _, _, dk, dv = lax.fori_loop(0, n_dev, step, (dq0, k, v, *dkv0))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# --- custom_vjp binding -----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring_attention(q, k, v, axis_name, causal, layout, scale, block_sizes,
                    interpret):
    o, _ = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, causal=causal, layout=layout,
        scale=scale, block_sizes=block_sizes, interpret=interpret)
    return o.astype(q.dtype)


def _ring_vjp_fwd(q, k, v, axis_name, causal, layout, scale, block_sizes,
                  interpret):
    o, lse = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, causal=causal, layout=layout,
        scale=scale, block_sizes=block_sizes, interpret=interpret)
    o = o.astype(q.dtype)
    return o, (q, k, v, o, lse)


def _ring_vjp_bwd(axis_name, causal, layout, scale, block_sizes, interpret,
                  res, do):
    q, k, v, o, lse = res
    return _ring_bwd_loop(
        q, k, v, o, lse, do, axis_name=axis_name, causal=causal,
        layout=layout, scale=scale, block_sizes=block_sizes,
        interpret=interpret)


_ring_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   layout: str = "contiguous", scale=None, block_sizes=None,
                   interpret=None):
    """Differentiable flash attention with q/k/v sequence-sharded over
    `axis_name`.

    Call inside shard_map with q,k,v chunked on the sequence dim. With
    `layout="contiguous"` the global sequence is the concatenation of
    chunks in axis order; with `layout="zigzag"` (causal only) each
    device holds chunks (d, 2n-1-d) of a 2n-way split — permute global
    arrays with `zigzag_order` first — and per-step causal work is
    perfectly balanced across the ring. Returns the local output chunk
    [B, Hq, N_local, D] in the same layout.
    """
    if layout not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "zigzag" and q.shape[2] % 2:
        raise ValueError(
            f"zigzag layout needs an even local sequence length (each "
            f"shard is a chunk pair); got {q.shape[2]}")
    return _ring_attention(q, k, v, axis_name, causal, layout, scale,
                           block_sizes, interpret)


def make_ring_attention(mesh, *, axis_name: str = "sp", causal: bool = False,
                        layout: str = "contiguous", qkv_spec=None, **kw):
    """shard_map-wrapped ring attention over `mesh`.

    qkv_spec defaults to sharding the sequence dim (2) over `axis_name`
    and leaving batch/heads replicated; pass a PartitionSpec to change
    (e.g. P("dp", None, "sp", None) to compose with dp/tp).
    """
    from jax.sharding import PartitionSpec as P

    if qkv_spec is None:
        qkv_spec = P(None, None, axis_name, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name, causal=causal,
                              layout=layout, **kw)

    return fn
