"""Command-line harness: verify-then-benchmark, N-way compare, perf-only.

TPU-native re-design of the reference's three executables:

  * `verify`  — the `cuda_fa1/main` program (main.cu:365-483): positional
    config `B H N D M runs` with the same defaults (1 8 512 64 4096 50),
    verify flash vs the exact baseline with the 2% gate, then benchmark
    both and report latency / GB/s / GFLOPs. The `M` knob feeds the FA1
    tile law exactly as the reference's CLI does (main.cu:293-295).
  * `compare` — the `test_flash_attn` program (test_flash_attn.cu:
    826-877): run every study implementation on the same seeded input,
    cross-check all pairs, print a perf + accuracy verdict; optionally
    record the stdout artifact like the checked-in `run/perf_*` logs.
  * `perf`    — the `perf_flash_attn_cutlass` program
    (perf_flash_attn_cutlass.cu:153-220): timing + analytic models only.

Profiling: `--profile DIR` wraps the benchmarked region in a JAX
profiler trace (XProf) — the role NVTX ranges + Nsight Compute play in
the reference (FA2-triton.py:186; code/README.md:8-26).

Usage:
    python -m flash_attention_tpu.cli verify 1 8 512 64 4096 50
    python -m flash_attention_tpu.cli compare --configs 1,32,8192,128
    python -m flash_attention_tpu.cli perf --configs 1,32,8192,128 --causal
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time

import numpy as np


def _make_inputs(batch, heads, seq, head_dim, dtype_name, seed=42,
                 kv_heads=None):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)  # mt19937(42) role, main.cu:30
    kv_heads = kv_heads or heads
    shape_q = (batch, heads, seq, head_dim)
    shape_kv = (batch, kv_heads, seq, head_dim)
    dt = jnp.dtype(dtype_name)
    return (
        jnp.asarray(rng.normal(0, 0.02, shape_q), dt),
        jnp.asarray(rng.normal(0, 0.02, shape_kv), dt),
        jnp.asarray(rng.normal(0, 0.02, shape_kv), dt),
    )


@contextlib.contextmanager
def _maybe_profile(profile_dir):
    import jax
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def cmd_verify(args):
    """Verify-then-benchmark (main.cu flow)."""
    import jax
    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.ops.reference import attention_baseline
    from flash_attention_tpu.ops.variants import fa1_tile_sizes
    from flash_attention_tpu.utils.bench import (
        attention_flops, attention_hbm_bytes, bench_attention,
    )
    from flash_attention_tpu.utils.metrics import verify

    b, h, n, d, m, runs = (args.B, args.H, args.N, args.D, args.M, args.runs)
    br, bc = fa1_tile_sizes(m, d)
    print(f"Config: B={b} H={h} N={n} d={d} M={m} runs={runs}")
    print(f"FA1 tile law -> Br={br} Bc={bc} (lane-aligned)")
    q, k, v = _make_inputs(b, h, n, d, args.dtype)

    out = flash_attention(q, k, v)
    ref = attention_baseline(q, k, v)
    report = verify(out, ref)
    print(report)
    if not report.passed:
        print("VERIFICATION FAILED")
        return 1

    with _maybe_profile(args.profile):
        base = bench_attention(
            "attention_baseline",
            jax.jit(lambda q, k, v: attention_baseline(q, k, v)),
            q, k, v, warmup=5, iters=max(2, runs // 10),
        )
        flash = bench_attention(
            "flash_attention",
            jax.jit(lambda q, k, v: flash_attention(q, k, v)),
            q, k, v, warmup=5, iters=max(2, runs // 10),
        )
    for r in (base, flash):
        print(r.line())
    print(f"speedup: {base.timing.mean_s / flash.timing.mean_s:.2f}x")
    return 0


def _study_outputs(q, k, v, causal):
    from flash_attention_tpu.ops.dispatch import (
        CAUSAL_CAPABLE, IMPLEMENTATIONS,
    )
    outs = {}
    for name, impl in IMPLEMENTATIONS.items():
        if name == "reference_exact":
            continue  # baseline_xla already covers the exact role
        if causal and name not in CAUSAL_CAPABLE:
            continue
        kw = {"causal": True} if causal and name in CAUSAL_CAPABLE else {}
        outs[name] = (impl, kw)
    return outs


def cmd_compare(args):
    """N-way comparison test (test_flash_attn.cu flow)."""
    import jax
    from flash_attention_tpu.utils.bench import bench_attention
    from flash_attention_tpu.utils.metrics import cross_check

    dev = jax.devices()[0]
    print(f"Device: {dev.device_kind} ({dev.platform})")  # banner :831-837
    exit_code = 0
    for cfg in args.configs:
        b, h, n, d = cfg
        print(f"\n=== Config B={b} H={h} N={n} D={d} "
              f"dtype={args.dtype} causal={args.causal} ===")
        q, k, v = _make_inputs(b, h, n, d, args.dtype)
        outs, reports = {}, []
        with _maybe_profile(args.profile):
            for name, (impl, kw) in _study_outputs(q, k, v, args.causal).items():
                rep = bench_attention(
                    name, jax.jit(lambda q, k, v, _i=impl, _k=kw:
                                  _i(q, k, v, **_k)),
                    q, k, v, causal=args.causal,
                    warmup=args.warmup, iters=args.iters,
                )
                outs[name] = jax.jit(
                    lambda q, k, v, _i=impl, _k=kw: _i(q, k, v, **_k)
                )(q, k, v)
                reports.append(rep)
        for rep in reports:
            print(rep.line())
        checks = cross_check(outs)
        ok = True
        for (a, bname), r in checks.items():
            status = "PASS" if r.passed else "FAIL"
            print(f"  {a:14s} vs {bname:14s}: max_rel="
                  f"{r.max_rel_err:.6f} [{status}]")
            ok &= r.passed
        print("accuracy verdict:", "ALL PASS" if ok else "FAILURES")
        if not ok:
            exit_code = 1
    return exit_code


def cmd_perf(args):
    """Perf-only benchmark (perf_flash_attn_cutlass.cu flow)."""
    import jax
    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.utils.bench import bench_attention

    for cfg in args.configs:
        b, h, n, d = cfg
        q, k, v = _make_inputs(b, h, n, d, args.dtype)
        with _maybe_profile(args.profile):
            rep = bench_attention(
                f"flash[{b},{h},{n},{d}]",
                jax.jit(lambda q, k, v: flash_attention(
                    q, k, v, causal=args.causal)),
                q, k, v, causal=args.causal,
                warmup=args.warmup, iters=args.iters,
            )
        print(rep.line())
    return 0


def _parse_configs(values):
    out = []
    for s in values:
        parts = [int(x) for x in s.split(",")]
        if len(parts) != 4:
            raise argparse.ArgumentTypeError(f"config must be B,H,N,D: {s}")
        out.append(tuple(parts))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="flash_attention_tpu.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("verify", help="verify then benchmark (main.cu role)")
    # Reference defaults: B=1 H=8 N=512 d=64 M=4096 runs=50 (main.cu:366-371)
    pv.add_argument("B", nargs="?", type=int, default=1)
    pv.add_argument("H", nargs="?", type=int, default=8)
    pv.add_argument("N", nargs="?", type=int, default=512)
    pv.add_argument("D", nargs="?", type=int, default=64)
    pv.add_argument("M", nargs="?", type=int, default=4096)
    pv.add_argument("runs", nargs="?", type=int, default=50)
    pv.add_argument("--dtype", default="float32")
    pv.add_argument("--profile", default=None)
    pv.set_defaults(fn=cmd_verify)

    pc = sub.add_parser("compare", help="N-way study comparison")
    pc.add_argument("--configs", nargs="+", default=["1,8,2048,128"])
    pc.add_argument("--dtype", default="bfloat16")
    pc.add_argument("--causal", action="store_true")
    pc.add_argument("--warmup", type=int, default=3)
    pc.add_argument("--iters", type=int, default=5)
    pc.add_argument("--profile", default=None)
    pc.set_defaults(fn=cmd_compare)

    pp = sub.add_parser("perf", help="perf-only benchmark")
    pp.add_argument("--configs", nargs="+",
                    default=["1,32,8192,128", "1,64,8192,128"])
    pp.add_argument("--dtype", default="bfloat16")
    pp.add_argument("--causal", action="store_true")
    pp.add_argument("--warmup", type=int, default=3)
    pp.add_argument("--iters", type=int, default=5)
    pp.add_argument("--profile", default=None)
    pp.set_defaults(fn=cmd_perf)

    args = p.parse_args(argv)
    if hasattr(args, "configs"):
        args.configs = _parse_configs(args.configs)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
