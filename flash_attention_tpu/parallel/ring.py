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

Causality across chunks: device d owns global q chunk d; the kv chunk
visiting at ring step t is src = (d - t) mod n. Three cases:
  src > d  -> fully masked, skip compute entirely;
  src == d -> the diagonal chunk, causal flash kernel;
  src < d  -> fully visible, non-causal flash kernel.
(The per-device load imbalance this creates — device 0 computes 1 chunk,
device n-1 computes n — is the classic ring-attention skew; the zigzag
chunk assignment that fixes it is future work.)

Per-step compute uses the single-chip Pallas flash kernel, so the intra-
chunk path is identical to the non-distributed one; XLA overlaps the
`ppermute` with the next step's compute when async collectives are on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from flash_attention_tpu.ops.flash import flash_attention_fwd


def _merge(o_acc, lse_acc, o_new, lse_new_part):
    """LSE-merge two normalized partials (fp32 accumulator)."""
    lse = jnp.logaddexp(lse_acc, lse_new_part)        # [B,H,N,LANES]
    w_old = jnp.exp(lse_acc - lse)[..., :1]
    w_new = jnp.exp(lse_new_part - lse)[..., :1]
    o = o_acc * w_old + o_new.astype(jnp.float32) * w_new
    return o, lse


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   scale=None, block_sizes=None, interpret=None):
    """Flash attention where q/k/v are sequence-sharded over `axis_name`.

    Call inside shard_map with q,k,v chunked on the sequence dim (global
    sequence = concatenation of chunks in axis order). Returns the local
    output chunk [B, Hq, N_local, D].
    """
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    batch, hq, n_local, d = q.shape

    neg_inf_lse = jnp.full((batch, hq, n_local, 128), -jnp.inf, jnp.float32)
    o0 = jnp.zeros((batch, hq, n_local, d), jnp.float32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    kw = dict(scale=scale, block_sizes=block_sizes, interpret=interpret)

    def full_chunk(q, k, v):
        return flash_attention_fwd(q, k, v, causal=False, **kw)

    def diag_chunk(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, offset=0, **kw)

    def skip_chunk(q, k, v):
        return (
            jnp.zeros_like(q),
            jnp.full((batch, hq, n_local, 128), -jnp.inf, jnp.float32),
        )

    def step(t, carry):
        o_acc, lse_acc, k_cur, v_cur = carry
        src = (my - t) % n_dev
        if causal:
            branch = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
            o_t, lse_t = lax.switch(
                branch, [skip_chunk, diag_chunk, full_chunk], q, k_cur, v_cur
            )
        else:
            o_t, lse_t = full_chunk(q, k_cur, v_cur)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_t, lse_t)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return o_acc, lse_acc, k_nxt, v_nxt

    o_acc, lse_acc, _, _ = lax.fori_loop(
        0, n_dev, step, (o0, neg_inf_lse, k, v)
    )
    return o_acc.astype(q.dtype)


def make_ring_attention(mesh, *, axis_name: str = "sp", causal: bool = False,
                        qkv_spec=None, **kw):
    """shard_map-wrapped ring attention over `mesh`.

    qkv_spec defaults to sharding the sequence dim (2) over `axis_name`
    and leaving batch/heads replicated; pass a PartitionSpec to change
    (e.g. P("dp", "tp", "sp", None) to compose with dp/tp).
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
                              **kw)

    return fn
