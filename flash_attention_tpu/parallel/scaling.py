"""Analytic multi-host decode-scaling model, fed by measured inputs.

Real N-host hardware is not available in this environment (SURVEY.md §5
"Distributed backend"; the reference never scales past one GPU), so the
north-star claim "≥90% multi-host decode scaling efficiency" is backed
by a FALSIFIABLE model instead of an unmeasurable assertion:

  predicted t_step(N) =  weight_read(N) + kv_read(N)
                       + Σ_collectives ring_time(bytes, N)
  efficiency(N)       =  t_step(1) / (N · t_step(N))

with every input either measured on this rig or taken from the public
part numbers it parameterizes over:

  * collective BYTES per decode step come from the ACTUAL optimized
    HLO of the shard_map'd TP decode step compiled on the virtual mesh
    (`hlo_collective_bytes`), not from hand counting — if the Megatron
    layout regresses (an extra all-gather sneaks in), the model's
    inputs change and tests catch it;
  * HBM effective bandwidth uses this repo's measured numbers
    (518-734 GB/s weight-read on v5e, benchmarks/bench_8b_*), not the
    819 GB/s plate rating;
  * ICI bandwidth/latency default to public v5e torus numbers
    (~100 GB/s/chip usable ring bandwidth, ~1 us/hop) and are
    parameters — substitute measured values on real hardware;
  * the cross-host (DCN/gloo) latency is measured by the 2-process rig
    (tests/multihost_worker.py times a tiny psum).

The model covers the two deployment shapes of BASELINE config 4/5:
data-parallel replicas (8B: no per-step collectives — efficiency is
bounded only by the serving scheduler) and tensor-parallel sharding
(70B: per-layer psums over ICI/DCN).
"""

from __future__ import annotations

import dataclasses
import re

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8,
}

# `= bf16[4,2048]{1,0} all-reduce(` — possibly a tuple of shapes for
# variadic collectives.
_COLLECTIVE_RE = re.compile(
    r"=\s*(\(?[a-z0-9]+\[[^=]*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shapes_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def hlo_collective_bytes(compiled) -> dict:
    """Sum the output bytes of every cross-device collective in a
    compiled executable's optimized HLO, keyed by op kind. Shapes in
    the HLO are per-shard (shard_map-local), which is exactly the
    per-chip buffer size the ring-cost model wants."""
    text = compiled.as_text() if hasattr(compiled, "as_text") else compiled
    out: dict = {}
    for m in _COLLECTIVE_RE.finditer(text):
        kind = m.group(2)
        out[kind] = out.get(kind, 0) + _shape_bytes(m.group(1))
    return out


@dataclasses.dataclass(frozen=True)
class Fabric:
    """Link parameters for one mesh axis. Defaults: v5e ICI ring."""

    bandwidth: float = 100e9      # usable B/s per chip along the ring
    latency: float = 1e-6         # per-hop latency (s)


# Public v5e numbers; substitute measured values where available.
V5E_ICI = Fabric(bandwidth=100e9, latency=1e-6)
# Cross-host DCN; latency from the 2-process gloo rig (~50-200 us
# loopback; real DCN is in the same decade).
V5E_DCN = Fabric(bandwidth=25e9, latency=100e-6)


def ring_all_reduce_time(nbytes: int, n: int, fabric: Fabric) -> float:
    """Ring all-reduce: each chip moves 2(N-1)/N of the buffer, in
    2(N-1) latency-bound steps."""
    if n <= 1:
        return 0.0
    return (2 * (n - 1) / n) * nbytes / fabric.bandwidth \
        + 2 * (n - 1) * fabric.latency


def ring_all_gather_time(nbytes_out: int, n: int, fabric: Fabric) -> float:
    if n <= 1:
        return 0.0
    return ((n - 1) / n) * nbytes_out / fabric.bandwidth \
        + (n - 1) * fabric.latency


@dataclasses.dataclass(frozen=True)
class DecodeStepCosts:
    """Per-decode-step inputs of the model (one chip's view at TP=1)."""

    weight_bytes: int             # full weight read per step
    kv_bytes: int                 # KV-cache read per step (batch total)
    # Per-step collective buffer bytes AT TP=tp_measured, from the HLO
    # of the compiled sharded step (hlo_collective_bytes).
    all_reduce_bytes: int
    all_gather_bytes: int
    tp_measured: int
    hbm_bw: float = 600e9         # measured effective, not plate


def predict_tp_decode(costs: DecodeStepCosts, n: int,
                      fabric: Fabric = V5E_ICI) -> dict:
    """Predicted decode step time and scaling efficiency at TP=n.

    Collective buffer sizes are activation-shaped ([batch, dim] class),
    so they are INDEPENDENT of tp for all-reduce (full buffer each) and
    proportional for the logits all-gather; the HLO measurement at
    tp_measured rescales accordingly.
    """
    t_hbm = (costs.weight_bytes / n + costs.kv_bytes / n) / costs.hbm_bw
    ar = ring_all_reduce_time(costs.all_reduce_bytes, n, fabric)
    ag = ring_all_gather_time(
        costs.all_gather_bytes * costs.tp_measured, n, fabric)
    t = t_hbm + ar + ag
    t1 = (costs.weight_bytes + costs.kv_bytes) / costs.hbm_bw
    return {
        "t_step": t,
        "t_hbm": t_hbm,
        "t_collective": ar + ag,
        "efficiency": t1 / (n * t) if n >= 1 else float("nan"),
    }


def predict_dp_decode(n_hosts: int, *, dispatch_overhead: float = 0.02
                      ) -> dict:
    """Data-parallel replicas exchange nothing per step; the only
    scaling loss is request-routing/dispatch skew, modeled as a fixed
    overhead fraction (measured upper bound from the engine's
    admission path)."""
    return {"efficiency": 1.0 - dispatch_overhead, "n_hosts": n_hosts}


def tp_decode_collective_bytes(cfg, tp: int, batch: int,
                               devices=None) -> dict:
    """Compile the ACTUAL shard_map'd TP decode step (tiny pools) on a
    CPU mesh and return its per-step collective bytes from the
    optimized HLO. Reduced-layer configs extrapolate linearly: the
    collectives are per-layer psums plus one logits all-gather."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flash_attention_tpu.models.llama import (
        decode_step_paged, init_params, serving_param_shardings,
    )
    from flash_attention_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(tp=tp, dp=-1, devices=devices)
    specs = serving_param_shardings(cfg, tp)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        init_params(cfg, jax.random.PRNGKey(0)), specs)
    hkv, hd, L = cfg.n_kv_heads, cfg.head_dim, cfg.n_layers
    pages, ps, tail = 4, 128, 16
    zeros = functools.partial(jnp.zeros, dtype=cfg.dtype)
    pool_s = [P("tp")] * L
    tail_s = [P(None, "tp")] * L
    kp = [jax.device_put(zeros((hkv, pages, ps, hd)),
                         NamedSharding(mesh, P("tp"))) for _ in range(L)]
    vp = [jax.device_put(zeros((hkv, pages, ps, hd)),
                         NamedSharding(mesh, P("tp"))) for _ in range(L)]
    kt = [jax.device_put(zeros((batch, hkv, tail, hd)),
                         NamedSharding(mesh, P(None, "tp")))
          for _ in range(L)]
    vt = [jax.device_put(zeros((batch, hkv, tail, hd)),
                         NamedSharding(mesh, P(None, "tp")))
          for _ in range(L)]
    step = jax.jit(jax.shard_map(
        lambda p, t, kp, vp, kt, vt, tb, ln, tp_: decode_step_paged(
            p, t, cfg, kp, vp, kt, vt, tb, ln, tp_, tp_axis="tp"),
        mesh=mesh,
        in_specs=(specs, P(), pool_s, pool_s, tail_s, tail_s,
                  P(), P(), P()),
        out_specs=(P(), tail_s, tail_s),
        check_vma=False))
    toks = jnp.zeros((batch,), jnp.int32)
    tbl = jnp.asarray(np.arange(batch * 2).reshape(batch, 2), jnp.int32)
    lens = jnp.full((batch,), ps, jnp.int32)
    tpos = jnp.zeros((batch,), jnp.int32)
    compiled = step.lower(
        params, toks, kp, vp, kt, vt, tbl, lens, tpos).compile()
    return hlo_collective_bytes(compiled)
