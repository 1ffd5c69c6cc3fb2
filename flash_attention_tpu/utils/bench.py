"""Benchmark harness: latency, throughput models, peak memory, max-batch.

TPU-native re-design of the reference's three timing harnesses:
  - chrono wall-clock with warmup (main.cu:102-121, test_flash_attn.cu:
    146-164): warmup=5, repeats bracketed by device sync;
  - CUDA-event timing (perf_flash_attn_cutlass.cu:117-133,
    FA2-triton.py:249-268): mean +- std over iters;
  - analytic FLOPs `4*B*H*N^2*d` and byte-traffic models
    (perf_flash_attn_cutlass.cu:60-76, pmph-a6.tex:174);
  - peak-memory + max-batch OOM binary search (FA2-triton.py:270-309,
    347-372).

Device-sync note: under some TPU transports `block_until_ready()` returns
before execution completes, so timing forces a small host readback of the
result instead — the moral equivalent of `cudaDeviceSynchronize`.
"""

from __future__ import annotations

import dataclasses
import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x):
    """Force completion of everything feeding `x` (host readback)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


@dataclasses.dataclass
class Timing:
    mean_s: float
    std_s: float
    min_s: float
    iters: int
    warmup: int

    @property
    def mean_ms(self) -> float:
        return self.mean_s * 1e3

    def __str__(self):
        return (
            f"{self.mean_ms:.3f} ms ± {self.std_s * 1e3:.3f} ms "
            f"(min {self.min_s * 1e3:.3f} ms, n={self.iters})"
        )


def measure(fn: Callable, *args, warmup: int = 5, iters: int = 10,
            inner: int = 16, **kwargs) -> Timing:
    """Time `fn(*args)` with sync-overhead cancellation.

    The host<->device sync round-trip can be tens of ms on tunneled
    transports, so a single bracketed loop overstates kernel time. Each
    sample times a chain of 1 dispatch and a chain of `inner` dispatches
    (both readback-bracketed) and takes the slope:
        T = (t_chain(inner) - t_chain(1)) / (inner - 1)
    which cancels the constant sync/readback term exactly.
    """
    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args, **kwargs)
        device_sync(out)
        return time.perf_counter() - t0

    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is None:
        out = fn(*args, **kwargs)   # warmup=0 still needs one compile
    device_sync(out)

    # Calibrate: grow the chain until kernel time dominates the sync
    # round-trip (otherwise its jitter swamps the slope for fast kernels).
    t_small = statistics.median(chain(1) for _ in range(3))
    while inner < 4096:
        t_big = chain(inner)
        if t_big >= 2.5 * t_small:
            break
        inner *= 4

    samples = []
    for _ in range(iters):
        t_big = chain(inner)
        samples.append(max((t_big - t_small) / (inner - 1), 0.0))
    return Timing(
        mean_s=statistics.fmean(samples),
        std_s=statistics.stdev(samples) if len(samples) > 1 else 0.0,
        min_s=min(samples),
        iters=iters,
        warmup=warmup,
    )


# --- analytic models (perf_flash_attn_cutlass.cu:60-76) -------------------


def attention_flops(batch, q_heads, q_len, kv_len, head_dim,
                    causal: bool = False) -> int:
    """2 matmuls x 2 flops: 4*B*H*Nq*Nk*D; causal halves the useful work."""
    total = 4 * batch * q_heads * q_len * kv_len * head_dim
    return total // 2 if causal else total


def attention_hbm_bytes(batch, q_heads, kv_heads, q_len, kv_len, head_dim,
                        itemsize: int = 2) -> int:
    """Minimum HBM traffic of a flash kernel: read Q/K/V once, write O.
    (The reference's model also counts S/P scratch because its naive
    kernel spills them to HBM — a flash kernel must not.)"""
    q = batch * q_heads * q_len * head_dim
    kv = 2 * batch * kv_heads * kv_len * head_dim
    return (2 * q + kv) * itemsize


@dataclasses.dataclass
class BenchReport:
    """One benchmark row (the reference's printed report card,
    test_flash_attn.cu:274-337)."""

    name: str
    config: dict
    timing: Timing
    tflops_per_s: float
    gb_per_s: float

    def line(self) -> str:
        return (
            f"{self.name:24s} {self.timing.mean_ms:10.3f} ms "
            f"{self.tflops_per_s:8.2f} TFLOP/s {self.gb_per_s:8.1f} GB/s"
        )


def bench_attention(name: str, fn: Callable, q, k, v, *, causal=False,
                    warmup=5, iters=10, inner=5, **kwargs) -> BenchReport:
    batch, hq, nq, d = q.shape
    _, hkv, nk, _ = k.shape
    t = measure(fn, q, k, v, warmup=warmup, iters=iters, inner=inner, **kwargs)
    flops = attention_flops(batch, hq, nq, nk, d, causal)
    bbytes = attention_hbm_bytes(
        batch, hq, hkv, nq, nk, d, jnp.dtype(q.dtype).itemsize
    )
    return BenchReport(
        name=name,
        config=dict(batch=batch, q_heads=hq, kv_heads=hkv, q_len=nq,
                    kv_len=nk, head_dim=d, causal=causal,
                    dtype=str(q.dtype)),
        timing=t,
        tflops_per_s=flops / t.mean_s / 1e12,
        gb_per_s=bbytes / t.mean_s / 1e9,
    )


# --- memory --------------------------------------------------------------


def peak_memory_bytes() -> int | None:
    """Per-device peak memory if the backend exposes it (role of
    torch.cuda.max_memory_allocated, FA2-triton.py:352)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("peak_bytes_in_use")


def find_max_batch(make_and_run: Callable[[int], None], *, start: int = 1,
                   limit: int = 1 << 16) -> int:
    """Exponential-growth + binary-search OOM probe
    (FA2-triton.py:270-309). `make_and_run(batch)` must allocate, run,
    and synchronize; raising an out-of-memory error marks failure."""

    def fits(b: int) -> bool:
        try:
            make_and_run(b)
            return True
        except Exception as e:  # XlaRuntimeError/RuntimeError: OOM
            msg = str(e).lower()
            if "resource exhausted" in msg or "out of memory" in msg or \
               "memory space" in msg:
                return False
            raise

    if not fits(start):
        return 0
    lo = start
    hi = start * 2
    while hi <= limit and fits(hi):
        lo, hi = hi, hi * 2
    # Doubling may overshoot a non-power-of-two limit; the binary search
    # still has to cover (lo, limit].
    hi = min(hi, limit + 1)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid
    return lo
