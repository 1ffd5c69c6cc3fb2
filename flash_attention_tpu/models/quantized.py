"""Weight-only INT8 quantization for the Llama family.

North-star enabler (BASELINE.json config 4): 8B bf16 weights (16 GB)
exceed a single v5e's HBM; per-output-channel int8 halves the footprint
AND the decode latency (decode is weight-read bound). Weights store as
2D int8 [contract, out] + fp32 per-output-channel scales; matmuls run
the fused-dequant Pallas kernel (ops/quant_matmul.py) for skinny decode
shapes and dequant-then-einsum for wide prefill/training shapes (where
the MXU, not HBM, is the bottleneck).

The model code is unchanged: every weight einsum goes through
`llama._mm`, which dispatches on QuantizedWeight.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.ops.quant_matmul import (
    INT4_GROUP,
    int4_matmul,
    quant_matmul,
    quantize_weight,
    quantize_weight_int4,
)

# Below this many rows, matmuls are weight-read bound and the int8
# kernel wins; above it, dequantize once and let the MXU run bf16.
_KERNEL_MAX_ROWS = 1024


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """2D int8 weight [K, F] + per-output-channel scale [F].

    orig_shape/n_contract recover the logical (possibly >2D) layout:
    the first n_contract dims of orig_shape are the contraction dims.
    """

    q: jax.Array
    scale: jax.Array
    orig_shape: tuple
    n_contract: int

    def tree_flatten(self):
        return (self.q, self.scale), (self.orig_shape, self.n_contract)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def nbytes(self) -> int:
        return self.q.size + self.scale.size * 4

    def dequant(self, dtype=jnp.bfloat16):
        w = self.q.astype(jnp.float32) * self.scale[None, :]
        return w.astype(dtype).reshape(self.orig_shape)

    def _matmul2d(self, x2):
        if x2.shape[0] <= _KERNEL_MAX_ROWS:
            return quant_matmul(x2, self.q, self.scale)
        wdq = (self.q.astype(jnp.float32)
               * self.scale[None, :]).astype(x2.dtype)
        return jnp.dot(x2, wdq)

    def einsum(self, spec, x):
        """Evaluate jnp.einsum(spec, x, self) with fused dequant."""
        return _weight_einsum(self, spec, x)


def _weight_einsum(w, spec, x):
    """Shared einsum plumbing for quantized-weight classes: normalize
    to a 2D [rows, contract] x [contract, out] matmul and restore the
    logical layout."""
    ins, out = spec.split("->")
    xs, ws = ins.split(",")
    contract = [c for c in ws if c in xs]
    wout = [c for c in ws if c not in xs]
    if list(ws) != contract + wout:
        raise ValueError(f"contraction dims must lead in {spec!r}")
    xkeep = [c for c in xs if c not in contract]
    perm = [xs.index(c) for c in xkeep + contract]
    xt = jnp.transpose(x, perm)
    keep_shape = xt.shape[: len(xkeep)]
    x2 = xt.reshape(int(np.prod(keep_shape) or 1), -1)
    y2 = w._matmul2d(x2)
    # Under shard_map the leaves are LOCAL shards while orig_shape stays
    # logical/global; a column-sharded weight (expand_param_shardings
    # puts the named axis on the leading out dim) scales that dim down.
    wout_shape = list(w.orig_shape[w.n_contract:])
    f_global = int(np.prod(wout_shape) or 1)
    f_local = y2.shape[1]
    if f_local != f_global:
        if wout_shape[0] * f_local % f_global:
            raise ValueError(
                f"local out width {f_local} incompatible with logical "
                f"out dims {tuple(wout_shape)}")
        wout_shape[0] = wout_shape[0] * f_local // f_global
    y = y2.reshape(*keep_shape, *wout_shape)
    cur = xkeep + wout
    return jnp.transpose(y, [cur.index(c) for c in out])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Int4Weight:
    """Packed int4 weight: bytes [K/2, F] (row-pair nibbles) + group
    -wise per-channel scales [K/INT4_GROUP, F] (ops/quant_matmul.py
    int4_matmul). Quarter the bf16 footprint; dequant fused in-kernel
    with group scales applied inside the contraction loop."""

    packed: jax.Array
    scales: jax.Array
    orig_shape: tuple
    n_contract: int

    def tree_flatten(self):
        return ((self.packed, self.scales),
                (self.orig_shape, self.n_contract))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def nbytes(self) -> int:
        return self.packed.size + self.scales.size * 4

    def _dequant2d(self, dtype):
        """[K_local, F_local] bf16 — no orig_shape reshape, so it works
        on shard_map-local leaves too."""
        u = self.packed.view(jnp.uint8).astype(jnp.int32)
        lo = ((u & 0xF) ^ 8) - 8
        hi = (((u >> 4) & 0xF) ^ 8) - 8
        kp2, f = u.shape
        q = jnp.stack([lo, hi], axis=1).reshape(2 * kp2, f)
        w = (q.astype(jnp.float32).reshape(-1, INT4_GROUP, f)
             * self.scales[:, None, :]).reshape(2 * kp2, f)
        return w.astype(dtype)

    def dequant(self, dtype=jnp.bfloat16):
        return self._dequant2d(dtype).reshape(self.orig_shape)

    def _matmul2d(self, x2):
        if x2.shape[0] <= _KERNEL_MAX_ROWS:
            return int4_matmul(x2, self.packed, self.scales)
        return jnp.dot(x2, self._dequant2d(x2.dtype))

    def einsum(self, spec, x):
        return _weight_einsum(self, spec, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedExpertStack:
    """Per-expert int8/fp8 weight stack: q [E, K, F] + per-(expert,
    out-channel) scales [E, F]. The grouped serving path
    (ops/grouped.py grouped_quant_matmul) fuses dequant in-kernel; the
    capacity path dequantizes per use (prefill/training, MXU-bound)."""

    q: jax.Array
    scale: jax.Array

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def orig_shape(self):
        return tuple(self.q.shape)

    @property
    def nbytes(self) -> int:
        return self.q.size + self.scale.size * 4

    def dequant(self, dtype=jnp.bfloat16):
        from flash_attention_tpu.ops.quant import tile_to_f32

        return (tile_to_f32(self.q)
                * self.scale[:, None, :]).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Int4ExpertStack:
    """Per-expert packed-int4 stack: packed [E, K/2, F] row-pair
    nibbles + group-wise scales [E, K/INT4_GROUP, F] (the
    ops/quant_matmul.py int4 layout, stacked over experts)."""

    packed: jax.Array
    scales: jax.Array
    logical_k: int

    def tree_flatten(self):
        return (self.packed, self.scales), (self.logical_k,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def orig_shape(self):
        e, _, f = self.packed.shape
        return (e, self.logical_k, f)

    @property
    def nbytes(self) -> int:
        return self.packed.size + self.scales.size * 4

    def dequant(self, dtype=jnp.bfloat16):
        u = self.packed.view(jnp.uint8).astype(jnp.int32)
        lo = ((u & 0xF) ^ 8) - 8
        hi = (((u >> 4) & 0xF) ^ 8) - 8
        e, kp2, f = u.shape
        q = jnp.stack([lo, hi], axis=2).reshape(e, 2 * kp2, f)
        w = (q.astype(jnp.float32).reshape(e, -1, INT4_GROUP, f)
             * self.scales[:, :, None, :]).reshape(e, 2 * kp2, f)
        return w.astype(dtype)


def quantize_expert_stack(w, dtype=jnp.int8):
    """Quantize an [E, K, F] expert weight stack (contraction = middle
    dim). int8/fp8 -> QuantizedExpertStack; "int4" -> Int4ExpertStack.

    Runs ON DEVICE (jnp, vectorized over experts): a Mixtral-class
    stack is ~1.9 GB fp32 — round-tripping it through host numpy costs
    minutes over a tunneled transport."""
    w = jnp.asarray(w, jnp.float32)
    e, k, f = w.shape
    if dtype == "int4":
        if k % INT4_GROUP:
            raise ValueError(f"K={k} must be a multiple of {INT4_GROUP}")
        g = w.reshape(e, k // INT4_GROUP, INT4_GROUP, f)
        scale = jnp.maximum(jnp.max(jnp.abs(g), axis=2) / 7.0, 1e-12)
        q = jnp.clip(jnp.round(g / scale[:, :, None, :]), -7, 7
                     ).astype(jnp.int32).reshape(e, k, f)
        lo = q[:, 0::2] & 0xF
        hi = q[:, 1::2] & 0xF
        packed = ((hi << 4) | lo).astype(jnp.uint8).view(jnp.int8)
        return Int4ExpertStack(packed=packed, scales=scale, logical_k=k)
    dtype = jnp.dtype(dtype)
    from flash_attention_tpu.ops.quant import _QMAX
    qmax = _QMAX[dtype]
    absmax = jnp.max(jnp.abs(w), axis=1)                  # [E, F]
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = w / scale[:, None, :]
    if dtype == jnp.dtype(jnp.int8):
        q = jnp.clip(jnp.round(q), -qmax, qmax)
    else:
        q = jnp.clip(q, -qmax, qmax)
    return QuantizedExpertStack(q=q.astype(dtype), scale=scale)


_EXPERT_STACK_KEYS = ("w_gate", "w_up", "w_down")


def quantize_moe_params(params: dict, *, quantize_lm_head: bool = True,
                        dtype=jnp.int8) -> dict:
    """Weight-only quantization of a MoE param tree (models/moe.py
    init_moe_params): attention projections quantize like the dense
    family, expert stacks become per-expert quantized stacks, the
    router stays fp32 (tiny; gate ordering is precision-sensitive)."""
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        ql = {}
        for name, w in layer.items():
            if name in _EXPERT_STACK_KEYS:
                ql[name] = quantize_expert_stack(w, dtype=dtype)
            elif name in _LAYER_SPECS:
                ql[name] = quantize_tensor(w, _LAYER_SPECS[name],
                                           dtype=dtype)
            else:
                ql[name] = w
        layers.append(ql)
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_tensor(params["lm_head"], 1, dtype=dtype)
    return out


def quantize_tensor(w, n_contract: int,
                    dtype=jnp.int8) -> QuantizedWeight:
    """Quantize a weight whose first n_contract dims are contracted."""
    shape = tuple(w.shape)
    k = int(np.prod(shape[:n_contract]))
    f = int(np.prod(shape[n_contract:]))
    w2 = np.asarray(w, np.float32).reshape(k, f)
    if dtype == "int4":
        packed, scales = quantize_weight_int4(w2)
        return Int4Weight(packed=packed, scales=scales,
                          orig_shape=shape, n_contract=n_contract)
    q, scale = quantize_weight(w2, dtype=dtype)
    return QuantizedWeight(q=q, scale=scale, orig_shape=shape,
                           n_contract=n_contract)


# First-n-contract-dims per llama weight name (llama.py init_params).
_LAYER_SPECS = {
    "wq": 1, "wk": 1, "wv": 1,       # [d, h, k]
    "wo": 2,                          # [h, k, d]
    "w_gate": 1, "w_up": 1, "w_down": 1,
}


def quantize_params(params: dict, *, quantize_lm_head: bool = True,
                    dtype=jnp.int8) -> dict:
    """Weight-only int8/fp8 quantization of a llama param tree. Norms
    and the embedding gather stay dense (tiny / not matmuls)."""
    out = dict(params)
    out["layers"] = [
        {
            name: (quantize_tensor(w, _LAYER_SPECS[name], dtype=dtype)
                   if name in _LAYER_SPECS else w)
            for name, w in layer.items()
        }
        for layer in params["layers"]
    ]
    if quantize_lm_head:
        out["lm_head"] = quantize_tensor(params["lm_head"], 1, dtype=dtype)
    return out


def init_quantized_params(cfg, key, dtype=jnp.int8) -> dict:
    """Directly initialize a quantized-weight param tree ON DEVICE —
    avoids materializing the bf16 tree (OOM at 8B on one chip) and the
    host->device transfer of a host-side quantization. Statistically
    matches quantize_params(init_params(...)): values with per-channel
    scales giving dequantized std ~ 1/sqrt(fan_in)."""
    from flash_attention_tpu.ops.quant import _QMAX

    if dtype != "int4":
        dtype = jnp.dtype(dtype)
        qmax = _QMAX[dtype]
    else:
        qmax = 7.0
    d, hd = cfg.dim, cfg.head_dim
    keys = jax.random.split(key, 4 + cfg.n_layers)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) /
                np.sqrt(fan_in)).astype(cfg.dtype)

    def qdense(k, shape, fan_in, n_contract):
        kk = int(np.prod(shape[:n_contract]))
        f = int(np.prod(shape[n_contract:]))
        if dtype == "int4":
            # Random packed nibbles; uniform int4 in [-8, 7] has std
            # ~4.64, so a constant scale restores 1/sqrt(fan_in).
            packed = jax.random.randint(
                k, (kk // 2, f), 0, 256, jnp.int32).astype(jnp.uint8
                                                           ).view(jnp.int8)
            scales = jnp.full(
                (kk // INT4_GROUP, f),
                1.0 / (4.64 * np.sqrt(fan_in)), jnp.float32)
            return Int4Weight(packed=packed, scales=scales,
                              orig_shape=tuple(shape),
                              n_contract=n_contract)
        if dtype == jnp.dtype(jnp.int8):
            q = jax.random.randint(k, (kk, f), -127, 128, jnp.int8)
            # Uniform int8 has std 127/sqrt(3); scale so the
            # dequantized std matches He init's 1/sqrt(fan_in).
            scale = jnp.full(
                (f,), np.sqrt(3.0) / (127.0 * np.sqrt(fan_in)),
                jnp.float32)
        else:
            # fp8: encode N(0, (qmax/4)^2) values (4-sigma clip range)
            # with a scale restoring std 1/sqrt(fan_in).
            w = jax.random.normal(k, (kk, f), jnp.float32) * (qmax / 4)
            q = jnp.clip(w, -qmax, qmax).astype(dtype)
            scale = jnp.full(
                (f,), 4.0 / (qmax * np.sqrt(fan_in)), jnp.float32)
        return QuantizedWeight(q=q, scale=scale, orig_shape=tuple(shape),
                               n_contract=n_contract)

    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 7)
        layers.append({
            "attn_norm": jnp.ones((d,), cfg.dtype),
            "wq": qdense(lk[0], (d, cfg.n_heads, hd), d, 1),
            "wk": qdense(lk[1], (d, cfg.n_kv_heads, hd), d, 1),
            "wv": qdense(lk[2], (d, cfg.n_kv_heads, hd), d, 1),
            "wo": qdense(lk[3], (cfg.n_heads, hd, d),
                         cfg.n_heads * hd, 2),
            "mlp_norm": jnp.ones((d,), cfg.dtype),
            "w_gate": qdense(lk[4], (d, cfg.ffn_dim), d, 1),
            "w_up": qdense(lk[5], (d, cfg.ffn_dim), d, 1),
            "w_down": qdense(lk[6], (cfg.ffn_dim, d), cfg.ffn_dim, 1),
        })
    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": qdense(keys[1], (d, cfg.vocab_size), d, 1),
    }


def init_quantized_moe_params(cfg, key, dtype="int4") -> dict:
    """Direct on-device quantized init of a MoE param tree (the
    init_quantized_params analog for models/moe.py layouts): Mixtral
    -class expert stacks at bf16 are ~93 GB — far beyond one chip or
    this host's RAM, so stacks initialize directly as packed values +
    constant scales with dequantized std ~ 1/sqrt(fan_in). Router stays
    dense fp32 (tiny; gate ordering is precision-sensitive)."""
    from flash_attention_tpu.ops.quant import _QMAX

    d, hd, f, e = cfg.dim, cfg.head_dim, cfg.ffn_dim, cfg.n_experts
    if dtype != "int4":
        dtype = jnp.dtype(dtype)
        qmax = _QMAX[dtype]
    keys = jax.random.split(key, 4 + cfg.n_layers)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) /
                np.sqrt(fan_in)).astype(cfg.dtype)

    def qdense(k, shape, fan_in, n_contract):
        kk = int(np.prod(shape[:n_contract]))
        fo = int(np.prod(shape[n_contract:]))
        if dtype == "int4":
            packed = jax.random.randint(
                k, (kk // 2, fo), 0, 256, jnp.int32
            ).astype(jnp.uint8).view(jnp.int8)
            scales = jnp.full((kk // INT4_GROUP, fo),
                              1.0 / (4.64 * np.sqrt(fan_in)), jnp.float32)
            return Int4Weight(packed=packed, scales=scales,
                              orig_shape=tuple(shape),
                              n_contract=n_contract)
        q = jax.random.randint(k, (kk, fo), -127, 128, jnp.int8)
        scale = jnp.full((fo,), np.sqrt(3.0) / (127.0 * np.sqrt(fan_in)),
                         jnp.float32)
        return QuantizedWeight(q=q, scale=scale, orig_shape=tuple(shape),
                               n_contract=n_contract)

    def qstack(k, kdim, fdim, fan_in):
        if dtype == "int4":
            packed = jax.random.randint(
                k, (e, kdim // 2, fdim), 0, 256, jnp.int32
            ).astype(jnp.uint8).view(jnp.int8)
            scales = jnp.full((e, kdim // INT4_GROUP, fdim),
                              1.0 / (4.64 * np.sqrt(fan_in)), jnp.float32)
            return Int4ExpertStack(packed=packed, scales=scales,
                                   logical_k=kdim)
        q = jax.random.randint(k, (e, kdim, fdim), -127, 128, jnp.int8)
        scale = jnp.full((e, fdim),
                         np.sqrt(3.0) / (127.0 * np.sqrt(fan_in)),
                         jnp.float32)
        return QuantizedExpertStack(q=q, scale=scale)

    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 8)
        layers.append({
            "attn_norm": jnp.ones((d,), cfg.dtype),
            "wq": qdense(lk[0], (d, cfg.n_heads, hd), d, 1),
            "wk": qdense(lk[1], (d, cfg.n_kv_heads, hd), d, 1),
            "wv": qdense(lk[2], (d, cfg.n_kv_heads, hd), d, 1),
            "wo": qdense(lk[3], (cfg.n_heads, hd, d),
                         cfg.n_heads * hd, 2),
            "mlp_norm": jnp.ones((d,), cfg.dtype),
            "router": jax.random.normal(lk[4], (d, e), jnp.float32)
            / np.sqrt(d),
            "w_gate": qstack(lk[5], d, f, d),
            "w_up": qstack(lk[6], d, f, d),
            "w_down": qstack(lk[7], f, d, f),
        })
    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": qdense(keys[1], (d, cfg.vocab_size), d, 1),
    }


def _quant_leaf_types():
    return (QuantizedWeight, Int4Weight,
            QuantizedExpertStack, Int4ExpertStack)


def params_nbytes(params) -> int:
    return sum(
        leaf.nbytes if hasattr(leaf, "nbytes") else 0
        for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, _quant_leaf_types()))
    )


def expand_param_shardings(params, pspecs):
    """Leaf-level PartitionSpecs for a (possibly quantized) param tree.

    `pspecs` carries one LOGICAL spec per weight (matching orig_shape,
    e.g. llama.serving_param_shardings). Quantized weights expand it to
    their physical leaves: the named axis of the contract group shards
    packed rows (and int4 group scales), the named axis of the out group
    shards columns (and per-channel scales). Because the physical layout
    flattens each group with its leading dim outermost, a named axis is
    only legal on a group's LEADING dim — true of every llama layout
    (wq/wk/wv heads, wo heads, mlp ffn, lm_head vocab).

    The returned tree is congruent with `params` (quantized nodes hold
    P leaves), so it drops straight into jax.tree.map device_put and
    shard_map in_specs."""
    from jax.sharding import PartitionSpec as P

    def expand(w, spec):
        if not isinstance(w, (QuantizedWeight, Int4Weight)):
            return spec
        full = tuple(spec) + (None,) * (len(w.orig_shape) - len(spec))
        cgrp, fgrp = full[: w.n_contract], full[w.n_contract:]
        for grp in (cgrp, fgrp):
            if any(a is not None for a in grp[1:]):
                raise ValueError(
                    "quantized weights shard only on each group's "
                    f"leading dim; got {spec} for shape {w.orig_shape} "
                    f"(n_contract={w.n_contract})")
        k_ax = cgrp[0] if cgrp else None
        f_ax = fgrp[0] if fgrp else None
        if isinstance(w, Int4Weight):
            return Int4Weight(packed=P(k_ax, f_ax), scales=P(k_ax, f_ax),
                              orig_shape=w.orig_shape,
                              n_contract=w.n_contract)
        return QuantizedWeight(q=P(k_ax, f_ax), scale=P(f_ax),
                               orig_shape=w.orig_shape,
                               n_contract=w.n_contract)

    return jax.tree.map(
        expand, params, pspecs,
        is_leaf=lambda x: isinstance(x, (QuantizedWeight, Int4Weight)))


def logical_param_count(params) -> int:
    """Number of LOGICAL model parameters: quantized weights count their
    unpacked orig_shape (an int4 8B tree is still an 8B model), dense
    leaves their size."""
    total = 0
    for leaf in jax.tree.leaves(
            params,
            is_leaf=lambda x: isinstance(x, _quant_leaf_types())):
        if isinstance(leaf, _quant_leaf_types()):
            total += int(np.prod(leaf.orig_shape))
        else:
            total += leaf.size
    return total
