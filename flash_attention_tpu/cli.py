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
import functools
import os
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

    from flash_attention_tpu.ops.variants import flash_attention_fa1

    b, h, n, d, m, runs = (args.B, args.H, args.N, args.D, args.M, args.runs)
    br, bc = fa1_tile_sizes(m, d)
    print(f"Config: B={b} H={h} N={n} d={d} M={m} runs={runs}")
    print(f"FA1 tile law -> Br={br} Bc={bc} (lane-aligned)")
    q, k, v = _make_inputs(b, h, n, d, args.dtype)

    # The M knob drives the FA1 kernel's tiles exactly as the
    # reference's CLI does (main.cu:293-295) — the verified/benchmarked
    # candidate IS the FA1 kernel under that budget.
    fa1 = jax.jit(lambda q, k, v: flash_attention_fa1(
        q, k, v, m_budget=m)[0])
    out = fa1(q, k, v)
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
            f"fa1[M={m}]", fa1,
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
        outs, reports, failures = {}, [], {}
        with _maybe_profile(args.profile):
            for name, (impl, kw) in _study_outputs(q, k, v, args.causal).items():
                # A per-impl OOM must not abort the study — the reference
                # hit exactly this (perf_2_32_8192_128 truncates when the
                # naive baseline demands 16.9 GB of scratch); record the
                # failure and keep benchmarking the kernels that fit.
                try:
                    fn = jax.jit(lambda q, k, v, _i=impl, _k=kw:
                                 _i(q, k, v, **_k))
                    rep = bench_attention(
                        name, fn, q, k, v, causal=args.causal,
                        warmup=args.warmup, iters=args.iters,
                    )
                    outs[name] = fn(q, k, v)   # reuse: no second compile
                    reports.append(rep)
                except Exception as e:  # XlaRuntimeError etc.
                    msg = str(e)
                    kind = ("OOM" if "memory" in msg.lower()
                            or "hbm" in msg.lower() else "ERROR")
                    failures[name] = (kind, msg.splitlines()[0][:120])
        for rep in reports:
            print(rep.line())
        for name, (kind, msg) in failures.items():
            print(f"{name:24s} {kind}: {msg}")
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
    """Perf-only benchmark (perf_flash_attn_cutlass.cu flow); --bwd adds
    the fwd+bwd step (the Triton harness's second timing,
    FA2-triton.py:357-364), with the 3.5x FLOPs model of a recompute
    backward (fwd 2 matmuls + bwd 5)."""
    import jax
    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.utils.bench import (
        attention_flops, bench_attention, measure, peak_memory_bytes,
    )

    for cfg in args.configs:
        b, h, n, d = cfg
        q, k, v = _make_inputs(b, h, n, d, args.dtype,
                               kv_heads=args.kv_heads)
        with _maybe_profile(args.profile):
            rep = bench_attention(
                f"flash[{b},{h},{n},{d}]",
                jax.jit(lambda q, k, v: flash_attention(
                    q, k, v, causal=args.causal)),
                q, k, v, causal=args.causal,
                warmup=args.warmup, iters=args.iters,
            )
        print(rep.line())
        if args.bwd:
            grad_fn = jax.jit(jax.grad(
                lambda q, k, v: jnp_sum_sq(flash_attention(
                    q, k, v, causal=args.causal)), (0, 1, 2)))
            t = measure(grad_fn, q, k, v,
                        warmup=args.warmup, iters=args.iters)
            flops = attention_flops(b, h, n, n, d, args.causal)
            total = flops * 3.5  # fwd(2) + dq recompute(2.5) + dkv(2.5)/2
            print(f"{'flash fwd+bwd':24s} {t.mean_ms:10.3f} ms "
                  f"{total / t.mean_s / 1e12:8.2f} TFLOP/s")
        peak = peak_memory_bytes()
        if peak:
            print(f"{'peak hbm':24s} {peak / 1e9:10.2f} GB")
    return 0


def jnp_sum_sq(x):
    import jax.numpy as jnp
    return jnp.sum(x.astype(jnp.float32) ** 2)


def cmd_max_batch(args):
    """Max-batch OOM search (FA2-triton.py:270-309 role): exponential
    growth + binary search of the largest batch whose fwd (or fwd+bwd)
    fits HBM."""
    import jax
    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.utils.bench import find_max_batch

    _, h, n, d = args.config

    def probe(batch):
        q, k, v = _make_inputs(batch, h, n, d, args.dtype)
        if args.bwd:
            out = jax.grad(lambda q, k, v: jnp_sum_sq(
                flash_attention(q, k, v, causal=args.causal)),
                (0, 1, 2))(q, k, v)
        else:
            out = flash_attention(q, k, v, causal=args.causal)
        jax.block_until_ready(out)

    best = find_max_batch(probe, limit=args.limit)
    mode = "fwd+bwd" if args.bwd else "fwd"
    print(f"max batch ({mode}, H={h} N={n} D={d} {args.dtype}): {best}")
    return 0


_PRESETS = {
    "tiny": "tiny", "1b": "llama3_1b", "8b": "llama3_8b",
    "70b": "llama3_70b", "mistral": "mistral_7b",
}


def cmd_decode_bench(args):
    """Decode throughput: paged attention kernel alone (bf16/int8/fp8
    pools) and, with --model, the full model decode step — the
    north-star decode tokens/s/chip metric (BASELINE.json)."""
    import jax
    import jax.numpy as jnp
    from flash_attention_tpu.ops.paged import paged_flash_decode
    from flash_attention_tpu.ops.quant import QUANT_BLOCK, _QMAX
    from flash_attention_tpu.utils.bench import measure

    b, hq, hkv, d = args.batch, args.q_heads, args.kv_heads, args.head_dim
    ctx, ps = args.context, args.page_size
    rng = np.random.default_rng(42)
    max_pages = -(-ctx // ps)
    num_pages = max(b * max_pages, 1)
    dev = jax.devices()[0]
    print(f"Device: {dev.device_kind} ({dev.platform})")
    print(f"decode-bench: batch={b} Hq={hq} Hkv={hkv} D={d} context={ctx} "
          f"page_size={ps} kv_dtype={args.kv_dtype}")

    q = jnp.asarray(rng.normal(0, 0.02, (b, hq, d)), jnp.bfloat16)
    pool_shape = (hkv, num_pages, ps, d)
    kf = rng.normal(0, 0.02, pool_shape).astype(np.float32)
    vf = rng.normal(0, 0.02, pool_shape).astype(np.float32)
    tables = jnp.asarray(
        rng.permutation(num_pages)[: b * max_pages].reshape(b, max_pages),
        jnp.int32)
    lengths = jnp.full((b,), ctx, jnp.int32)

    if args.kv_dtype == "bfloat16":
        k_pool = jnp.asarray(kf, jnp.bfloat16)
        v_pool = jnp.asarray(vf, jnp.bfloat16)
        scales = dict(k_scales=None, v_scales=None)
        kv_bytes = 2
    else:
        dt = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
              "fp8_e5m2": jnp.float8_e5m2}[args.kv_dtype]
        qmax = _QMAX[jnp.dtype(dt)]

        @jax.jit
        def quant(x):
            # On-device: a 268M-element pool in host numpy takes minutes
            # on a small VM and looks like a hang.
            xr = jnp.asarray(x, jnp.float32).reshape(
                hkv, num_pages, ps // QUANT_BLOCK, QUANT_BLOCK, d)
            sc = jnp.maximum(
                jnp.max(jnp.abs(xr), axis=3, keepdims=True) / qmax, 1e-8)
            qv = xr / sc
            if jnp.dtype(dt) == jnp.dtype(jnp.int8):
                qv = jnp.clip(jnp.round(qv), -qmax, qmax)
            return (qv.astype(dt).reshape(pool_shape), sc[..., 0, :])

        k_pool, k_sc = quant(kf)
        v_pool, v_sc = quant(vf)
        jax.block_until_ready((k_pool, v_sc))
        scales = dict(k_scales=k_sc, v_scales=v_sc)
        kv_bytes = 1

    fn = jax.jit(lambda q, kp, vp, t, l: paged_flash_decode(
        q, kp, vp, t, l, fold_scales=args.fold_scales, **scales))
    t = measure(fn, q, k_pool, v_pool, tables, lengths,
                warmup=args.warmup, iters=args.iters)
    live_bytes = 2 * b * hkv * ctx * d * kv_bytes
    print(f"attention decode: {t.mean_ms * 1e3:8.1f} us/step  "
          f"{b / t.mean_s:10.0f} tok/s  "
          f"{live_bytes / t.mean_s / 1e9:7.1f} GB/s KV read")

    if args.model:
        from flash_attention_tpu.models.llama import (
            LlamaConfig, decode_step_paged, init_params,
        )
        overrides = {}
        if getattr(args, "model_layers", None):
            overrides["n_layers"] = args.model_layers
        if args.model == "mixtral":
            # Mixtral-8x7B-class MoE decode through the SAME paged loop
            # (_mlp_block dispatches on the router key). Dropless
            # grouped expert path; int4 experts are the only single
            # -chip-feasible config (46.7B params — see SERVING.md).
            from flash_attention_tpu.models.moe import MoEConfig

            cfg = MoEConfig.mixtral_8x7b(
                dtype=jnp.bfloat16, routing="dropless", **overrides)
            if args.weight_quant:
                from flash_attention_tpu.models.quantized import (
                    init_quantized_moe_params,
                )
                wdt = {"int8": jnp.int8, "int4": "int4",
                       "fp8": jnp.float8_e4m3fn}[args.weight_quant]
                params = init_quantized_moe_params(
                    cfg, jax.random.PRNGKey(0), dtype=wdt)
            else:
                from flash_attention_tpu.models.moe import init_moe_params
                params = init_moe_params(cfg, jax.random.PRNGKey(0))
        else:
            cfg = getattr(LlamaConfig, _PRESETS[args.model])(
                dtype=jnp.bfloat16, **overrides)
            if args.weight_quant:
                # Direct on-device quantized init: a bf16 8B tree would
                # OOM the chip before host-side quantization could run.
                from flash_attention_tpu.models.quantized import (
                    init_quantized_params,
                )
                wdt = {"int8": jnp.int8, "int4": "int4",
                       "fp8": jnp.float8_e4m3fn}[args.weight_quant]
                params = init_quantized_params(
                    cfg, jax.random.PRNGKey(0), dtype=wdt)
            else:
                params = init_params(cfg, jax.random.PRNGKey(0))
        bm, ctxm = args.model_batch, args.model_context
        mp = -(-ctxm // ps)
        npg = max(bm * mp, 1) + 1
        kv_q = args.model_kv in ("int8", "fp8", "fp8_e5m2")
        pool_dtype = {
            "int8": jnp.int8,
            "fp8": jnp.float8_e4m3fn,       # bit-plant dequant on v5e
            "fp8_e5m2": jnp.float8_e5m2,
            None: jnp.bfloat16, "none": jnp.bfloat16,
        }[args.model_kv]
        pool_shape = (cfg.n_kv_heads, npg, ps, cfg.head_dim)
        from flash_attention_tpu.ops.quant import QUANT_BLOCK
        scale_shape = (cfg.n_kv_heads, npg, ps // QUANT_BLOCK,
                       cfg.head_dim)
        tail = max(args.model_steps + 1, 128)
        tail_shape = (bm, cfg.n_kv_heads, tail, cfg.head_dim)
        tbl = jnp.asarray(1 + np.arange(bm * mp).reshape(bm, mp), jnp.int32)
        steps = args.model_steps
        # The engine's greedy serving loop fused into one program: scan
        # `steps` decode steps feeding argmax tokens back. Pages are
        # READ-ONLY; per-token KV lands in donated hot-tail buffers
        # (models/llama.py decode_step_paged design note).
        paged_lens = jnp.full((bm,), ctxm - steps - 1, jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(3, 4))
        def run(params, kp, vp, kt, vt, tok0, ksc, vsc):
            def body(carry, tpos):
                tok, kt, vt = carry
                logits, kt, vt = decode_step_paged(
                    params, tok, cfg, kp, vp, kt, vt, tbl, paged_lens,
                    jnp.full((bm,), tpos, jnp.int32),
                    k_scales=ksc, v_scales=vsc)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, kt, vt), nxt
            (tok, kt, vt), toks = jax.lax.scan(
                body, (tok0, kt, vt), jnp.arange(steps))
            return toks, kt, vt

        def fresh_tails():
            return ([jnp.zeros(tail_shape, jnp.bfloat16)
                     for _ in range(cfg.n_layers)],
                    [jnp.zeros(tail_shape, jnp.bfloat16)
                     for _ in range(cfg.n_layers)])

        from flash_attention_tpu.utils.bench import device_sync

        tok0 = jnp.zeros((bm,), jnp.int32)
        kp = [jnp.zeros(pool_shape, pool_dtype)
              for _ in range(cfg.n_layers)]
        vp = [jnp.zeros(pool_shape, pool_dtype)
              for _ in range(cfg.n_layers)]
        if kv_q:
            ksc = [jnp.full(scale_shape, 1e-3, jnp.float32)
                   for _ in range(cfg.n_layers)]
            vsc = [jnp.full(scale_shape, 1e-3, jnp.float32)
                   for _ in range(cfg.n_layers)]
        else:
            ksc = vsc = None
        kt, vt = fresh_tails()
        toks, kt2, vt2 = run(params, kp, vp, kt, vt, tok0, ksc, vsc)
        device_sync(toks)      # block_until_ready is unreliable here
        del kt2, vt2
        times = []
        for _ in range(max(args.iters // 3, 2)):
            kt, vt = fresh_tails()
            device_sync(kt)
            t0 = time.perf_counter()
            toks, kt, vt = run(params, kp, vp, kt, vt, tok0, ksc, vsc)
            device_sync(toks)  # 1-element readback barrier
            times.append(time.perf_counter() - t0)
        best = min(times)
        from flash_attention_tpu.models.quantized import (
            logical_param_count,
        )
        n_params = logical_param_count(params)
        p_gb = sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(params)) / 1e9
        kv_gb = (2 * cfg.n_layers * np.prod(pool_shape)
                 * jnp.dtype(pool_dtype).itemsize / 1e9)
        wq = f" weights={args.weight_quant}" if args.weight_quant else ""
        kvq_s = f" kv={args.model_kv}" if kv_q else ""
        print(f"model decode ({args.model}, {n_params / 1e9:.2f}B params "
              f"= {p_gb:.1f} GB{wq}, {kv_gb:.1f} GB KV pools{kvq_s}): "
              f"batch={bm} context~{ctxm} steps={steps}")
        print(f"  {best / steps * 1e3:8.3f} ms/step  "
              f"{bm * steps / best:8.0f} tok/s/chip")
    return 0


def cmd_moe_bench(args):
    """MoE expert-MLP throughput: capacity-routed one-hot dispatch vs
    the grouped (dropless, sort-by-expert) path, dense and quantized
    expert stacks, at Mixtral-8x7B layer shapes. The one-hot
    dispatch/combine cubes cost O(n·E·C·d) MXU work (quadratic in
    tokens); the grouped path replaces them with one argsort + ragged
    Pallas matmuls (ops/grouped.py)."""
    import jax
    import jax.numpy as jnp
    from flash_attention_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_mlp, moe_mlp_grouped,
    )
    from flash_attention_tpu.models.quantized import quantize_moe_params
    from flash_attention_tpu.utils.bench import measure

    dev = jax.devices()[0]
    print(f"Device: {dev.device_kind} ({dev.platform})")
    cfg = MoEConfig.mixtral_8x7b(
        n_layers=1, dim=args.dim, ffn_dim=args.ffn_dim,
        n_experts=args.experts, top_k=args.top_k, dtype=jnp.bfloat16)
    print(f"moe-bench: E={cfg.n_experts} top_k={cfg.top_k} "
          f"d={cfg.dim} ffn={cfg.ffn_dim} (Mixtral-8x7B layer shapes)")
    params = init_moe_params(cfg, jax.random.PRNGKey(0))
    layer = params["layers"][0]
    qlayers = {
        wq: quantize_moe_params(params, dtype={"int8": jnp.int8,
                                               "int4": "int4"}[wq],
                                quantize_lm_head=False)["layers"][0]
        for wq in args.weight_quants
    }
    rng = np.random.default_rng(42)

    # Active-FLOPs model: top_k expert SwiGLUs per token (2 m·k·f per
    # matmul, 3 matmuls), the convention the grouped path achieves
    # exactly; the one-hot path additionally burns dispatch/combine.
    def mlp_flops(n):
        return 2 * 3 * n * cfg.top_k * cfg.dim * cfg.ffn_dim

    for n in args.tokens:
        x = jnp.asarray(rng.normal(0, 0.5, (1, n, cfg.dim)), jnp.bfloat16)
        onehot = jax.jit(lambda x, l: moe_mlp(l, x, cfg)[0])
        grouped = jax.jit(lambda x, l: moe_mlp_grouped(l, x, cfg)[0])
        t1 = measure(onehot, x, layer, warmup=args.warmup,
                     iters=args.iters)
        t2 = measure(grouped, x, layer, warmup=args.warmup,
                     iters=args.iters)
        fl = mlp_flops(n)
        print(f"  n={n:6d}  one-hot {t1.mean_ms:8.3f} ms "
              f"({fl / t1.mean_s / 1e12:6.2f} TF/s active)   "
              f"grouped {t2.mean_ms:8.3f} ms "
              f"({fl / t2.mean_s / 1e12:6.2f} TF/s active)   "
              f"speedup {t1.mean_ms / t2.mean_ms:5.2f}x")
        for wq, ql in qlayers.items():
            tq = measure(grouped, x, ql, warmup=args.warmup,
                         iters=args.iters)
            print(f"  n={n:6d}  grouped[{wq}] {tq.mean_ms:8.3f} ms "
                  f"({fl / tq.mean_s / 1e12:6.2f} TF/s active)")
    return 0


def cmd_profile(args):
    """Compiler-level profile of the flagship kernel (role of the NCU
    artifact, cuda_fa1/profile_ncu / SURVEY.md C27): XLA cost analysis,
    memory analysis, achieved-vs-peak utilization, plus an optional
    XProf trace directory for xprof/tensorboard."""
    import jax
    from flash_attention_tpu.ops.flash import flash_attention
    from flash_attention_tpu.utils.bench import (
        attention_flops, bench_attention,
    )

    b, h, n, d = args.config
    q, k, v = _make_inputs(b, h, n, d, args.dtype)
    dev = jax.devices()[0]
    print(f"Device: {dev.device_kind} ({dev.platform})")
    print(f"profile: config B={b} H={h} N={n} D={d} dtype={args.dtype} "
          f"causal={args.causal}")

    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v,
                                                 causal=args.causal))
    compiled = fn.lower(q, k, v).compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    print("\n== XLA cost analysis ==")
    for key in sorted(cost):
        val = cost[key]
        if isinstance(val, (int, float)) and val:
            print(f"  {key:28s} {val:,.0f}")
    if mem is not None:
        print("== memory analysis ==")
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            print(f"  {attr:28s} {getattr(mem, attr, 0):,}")

    with _maybe_profile(args.profile):
        rep = bench_attention("flash", fn, q, k, v, causal=args.causal,
                              warmup=args.warmup, iters=args.iters)
    print("\n== measured ==")
    print(rep.line())
    flops = attention_flops(b, h, n, n, d, args.causal)
    print(f"  analytic FLOPs {flops:,}")
    if args.peak_tflops:
        print(f"  utilization vs peak ({args.peak_tflops} TFLOP/s): "
              f"{100 * rep.tflops_per_s / args.peak_tflops:.1f}%")
    if args.profile:
        print(f"  XProf trace written under {args.profile}")
    return 0


def cmd_train_bench(args):
    """Model-level training throughput: tokens/s + MFU for the fused
    train step (fwd + recompute bwd + adamw) on one chip."""
    import jax
    import jax.numpy as jnp
    import optax
    from flash_attention_tpu.models.llama import (
        LlamaConfig, init_params, make_train_step,
    )
    from flash_attention_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_loss_fn,
    )
    from flash_attention_tpu.utils.bench import device_sync

    if args.moe:
        base = getattr(LlamaConfig, _PRESETS[args.model])(
            dtype=jnp.bfloat16)
        cfg = MoEConfig(**{**base.__dict__})
        params = init_moe_params(cfg, jax.random.PRNGKey(0))

        def loss(p, toks):
            return moe_loss_fn(p, toks, cfg, remat=args.remat)[0]

        def make_step(opt):
            def step(p, ost, toks):
                l, g = jax.value_and_grad(loss)(p, toks)
                upd, ost = opt.update(g, ost, p)
                return optax.apply_updates(p, upd), ost, l
            return step
    else:
        cfg = getattr(LlamaConfig, _PRESETS[args.model])(
            dtype=jnp.bfloat16)
        params = init_params(cfg, jax.random.PRNGKey(0))

        def make_step(opt):
            return make_train_step(cfg, opt, remat=args.remat)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    # MoE MFU convention: FLOPs count ACTIVE params (top_k of n_experts
    # expert stacks), not total — dense published MFU numbers use the
    # activated-params convention and total would inflate MoE ~E/top_k x.
    if args.moe:
        expert = sum(
            layer[k].size for layer in params["layers"] if "router" in layer
            for k in ("w_gate", "w_up", "w_down"))
        n_active = n_params - expert + expert * cfg.top_k // cfg.n_experts
    else:
        n_active = n_params
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_step(opt), donate_argnums=(0, 1))
    rng = np.random.default_rng(42)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (args.batch, args.seq + 1)),
        jnp.int32)

    params, opt_state, l0 = step(params, opt_state, tokens)  # compile
    device_sync(l0)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss_v = step(params, opt_state, tokens)
    device_sync(loss_v)
    dt = time.perf_counter() - t0
    toks = args.batch * args.seq * args.steps
    # Dense-param FLOPs 6*N*tokens (fwd 2 + bwd 4) + causal attention
    # 12*L*H*T^2*D*frac (fwd 4 halved by causality -> 2, bwd 2.5x with
    # recompute -> ~... use the standard 6+attention convention).
    attn = 6 * cfg.n_layers * cfg.n_heads * args.seq ** 2         * cfg.head_dim * args.batch * args.steps
    flops = 6 * n_active * toks + attn
    tps = toks / dt
    mfu = flops / dt / (args.peak_tflops * 1e12)
    act = (f" ({n_active / 1e9:.2f}B active)" if n_active != n_params
           else "")
    print(f"train-bench [{args.model}{' moe' if args.moe else ''}]: "
          f"{n_params / 1e9:.2f}B params{act}, batch {args.batch} x seq "
          f"{args.seq}, remat={args.remat}")
    print(f"  {args.steps} steps in {dt:.2f} s = "
          f"{dt / args.steps * 1e3:.0f} ms/step, {tps:,.0f} tok/s/chip, "
          f"MFU {mfu * 100:.1f}% (loss {float(loss_v):.3f})")
    return 0


def cmd_serve_bench(args):
    """Engine end-to-end: continuous batching over real requests."""
    import jax
    import jax.numpy as jnp
    from flash_attention_tpu.models.llama import LlamaConfig, init_params
    from flash_attention_tpu.runtime.engine import (
        Engine, EngineStats, Request,
    )

    overrides = {}
    if getattr(args, "model_layers", None):
        overrides["n_layers"] = args.model_layers
    if getattr(args, "window", None):
        # Sliding-window override on any preset: the windowed serving
        # runtime (rolling prefill buffer, O(window) page eviction) is
        # model-size-independent, so small presets can carry the
        # long-context window artifacts that 7B-class weights + per-task
        # rolling buffers cannot fit beside on one 16 GB chip.
        overrides["window"] = args.window
    cfg = getattr(LlamaConfig, _PRESETS[args.model])(
        dtype=jnp.bfloat16, **overrides)
    wdt = None
    if args.weight_quant:
        wdt = {"int8": jnp.int8, "int4": "int4",
               "fp8": jnp.float8_e4m3fn}[args.weight_quant]
    if getattr(args, "load", None):
        from flash_attention_tpu.utils.safetensors import (
            params_from_safetensors,
        )
        params = params_from_safetensors(
            args.load, cfg, layout="hf", quantize=wdt)
    elif wdt is not None:
        from flash_attention_tpu.models.quantized import (
            init_quantized_params,
        )
        params = init_quantized_params(cfg, jax.random.PRNGKey(0),
                                       dtype=wdt)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    draft_params = draft_cfg = None
    if getattr(args, "draft_dim", None):
        draft_cfg = LlamaConfig(
            vocab_size=cfg.vocab_size, dim=args.draft_dim,
            n_layers=args.draft_layers, n_heads=args.draft_heads,
            n_kv_heads=args.draft_kv_heads, ffn_dim=args.draft_ffn,
            dtype=jnp.bfloat16)
        if args.draft_load:
            from flash_attention_tpu.utils.safetensors import (
                params_from_safetensors,
            )
            draft_params = params_from_safetensors(
                args.draft_load, draft_cfg, layout="hf")
        else:
            draft_params = init_params(draft_cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(42)
    kvq = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
           None: None, "none": None}[args.kv_quant]

    # --shared-prefix: every request opens with this many common tokens
    # (a system prompt) — the workload automatic prefix caching serves.
    shared = list(rng.integers(0, cfg.vocab_size, args.shared_prefix)) \
        if args.shared_prefix else []

    # Pre-draw every prompt (same rng order as per-call draws) so the
    # oracle-draft mode can pre-compute the measured round's greedy
    # transcripts before the speculative engine sees them.
    tail = max(args.prompt_len - len(shared), 1)
    n_warm = min(args.batch + 1, args.requests)
    if getattr(args, "corpus", None):
        # Structured workload: walk the fixed permutation chain (the
        # "language" scripts/train_spec_pair.py trains on). Prompts
        # never self-repeat within a window shorter than the chain
        # period, so n-gram prompt-lookup drafts get ~0% acceptance
        # while a TRAINED draft model carries the global next-token
        # function — the workload that separates model-based drafting
        # from lookup drafting.
        kind, _, size = args.corpus.partition(":")
        if kind != "chain":
            raise SystemExit(f"unknown --corpus kind {kind!r}")
        csize = int(size or 4096)
        perm = np.random.default_rng(1234).permutation(csize)

        def chain_prompt(n):
            t = int(rng.integers(0, csize))
            out = []
            for _ in range(n):
                out.append(int(t))
                t = int(perm[t])
            return out

        all_prompts = [chain_prompt(args.prompt_len)
                       for _ in range(n_warm + args.requests)]
    else:
        all_prompts = [
            shared + list(rng.integers(0, cfg.vocab_size, tail))
            for _ in range(n_warm + args.requests)
        ]
    queue = list(all_prompts)

    def make_reqs(n):
        return [Request(prompt=queue.pop(0),
                        max_new_tokens=args.gen_len) for _ in range(n)]

    draft_fn = None
    if args.spec_oracle is not None:
        # Mechanism benchmark: drafts come from a pre-computed greedy
        # transcript of the SAME requests (per-token corruption prob
        # 1 - P), so acceptance is a controlled knob instead of a
        # property of random-weight text. Greedy verification never
        # emits a wrong token, so the oracle stays aligned even when
        # drafts are corrupted. This measures the speedup-vs-acceptance
        # curve of the speculative machinery itself; the n-gram row
        # (plain --spec-k) measures realistic acceptance on this
        # workload.
        if not args.spec_k:
            raise SystemExit("--spec-oracle requires --spec-k")
        # The pre-run uses the SAME speculative verify program (with
        # the default n-gram drafts): a different decode program makes
        # numerically different argmax picks on random-weight near-ties
        # and the oracle diverges from the measured run's transcript.
        pre = Engine(params, cfg, max_batch=args.batch,
                     num_pages=args.num_pages, page_size=args.page_size,
                     kv_quant_dtype=kvq, decode_chunk=1,
                     prefill_chunk=args.prefill_chunk,
                     speculative_k=args.spec_k)
        measured = all_prompts[n_warm:]
        pre_reqs = [Request(prompt=list(p), max_new_tokens=args.gen_len)
                    for p in measured]
        by_id = {r.request_id: r.prompt for r in pre_reqs}
        # Key by the FULL prompt (every measured prompt has the same
        # length `plen`): a 16-token prefix key collides for every
        # request when --shared-prefix >= 16, and never matches when
        # prompt_len < 16 (history[:16] would include generated tokens)
        # — either way drafts silently degrade to garbage. Identical
        # prompts colliding is harmless (greedy transcripts coincide).
        plen = len(shared) + tail
        oracle = {}
        for c in pre.run(pre_reqs):
            p = by_id[c.request_id]
            assert len(p) == plen
            oracle[tuple(int(x) for x in p)] = \
                [int(x) for x in p] + [int(x) for x in c.tokens]
        del pre_reqs
        del pre
        import gc
        gc.collect()   # drop the pre-engine's pools before the real
        #                engine allocates its own (HBM holds ~one set)
        orng = np.random.default_rng(7)
        vocab = cfg.vocab_size

        def draft_fn(history, k):
            full = oracle.get(tuple(int(x) for x in history[:plen]))
            pos = len(history)
            cont = list(full[pos:pos + k]) if full else []
            while len(cont) < k:
                cont.append(cont[-1] if cont else 0)
            for i in range(k):
                if orng.random() > args.spec_oracle:
                    cont[i] = int(orng.integers(0, vocab))
            return np.asarray(cont, np.int32)

    eng = Engine(params, cfg, max_batch=args.batch,
                 num_pages=args.num_pages, page_size=args.page_size,
                 kv_quant_dtype=kvq,
                 decode_chunk=1 if args.spec_k else args.decode_chunk,
                 prefill_chunk=args.prefill_chunk,
                 prefix_cache=args.prefix_cache,
                 speculative_k=args.spec_k,
                 speculative_rounds=getattr(args, "spec_rounds", 1) or 1,
                 tail_size=(
                     # Default tail (= page_size) unless the fused
                     # multi-round span needs a bigger one.
                     None if (args.spec_k + 1) * (getattr(
                         args, "spec_rounds", 1) or 1) < args.page_size
                     else (args.spec_k + 1) * (getattr(
                         args, "spec_rounds", 1) or 1) + 1),
                 draft_fn=draft_fn,
                 draft_params=draft_params, draft_cfg=draft_cfg)

    # Warmup round compiles prefill/decode/flush programs; the engine is
    # then reused so the measured round is compile-free. Open-loop
    # arrivals additionally exercise every pow2 prefill group size
    # (queue-depth dependent), so precompile them all — a cold Mosaic
    # compile mid-serve would poison TTFT for the whole backlog.
    eng.run(make_reqs(min(args.batch + 1, args.requests)))
    if args.prefill_chunk or args.prefix_cache:
        eng.precompile_chunked_prefill(args.prompt_len)
        if args.prefix_cache and args.shared_prefix and queue:
            # Warm the suffix-task shape too: a hit of `cached` tokens
            # dispatches chunks sized from the suffix span, and any
            # group size not compiled here stalls the serve on a
            # mid-run compile. The hit length comes from an ENGINE
            # probe on the next measured prompt (pages matched then
            # released) — re-deriving the allocator's page rounding in
            # the CLI silently warmed the wrong shape when they
            # disagreed.
            cached = eng.probe_prefix(queue[0])
            if cached:
                eng.precompile_chunked_prefill(
                    args.prompt_len, cached_tokens=cached)
    eng.precompile_decode()
    import dataclasses as _dc
    base = _dc.replace(eng.stats)
    n_ttft_base = len(eng.stats.ttft_s)
    if args.trace:
        eng.trace = []
    t0 = time.perf_counter()
    if args.arrival_rate:
        # Open-loop Poisson arrivals: the standard serving-latency
        # methodology (closed bursts measure queue depth, not the
        # engine — every TTFT includes the whole backlog ahead of it).
        # Requests arrive at `--arrival-rate` req/s on a wall clock;
        # TTFT runs from arrival (queue wait included).
        reqs = make_reqs(args.requests)
        arrive = np.cumsum(
            rng.exponential(1.0 / args.arrival_rate, len(reqs)))
        comps, nxt = [], 0
        while (nxt < len(reqs) or eng.pending or eng.prefilling
               or eng.num_active):
            now = time.perf_counter() - t0
            while nxt < len(reqs) and arrive[nxt] <= now:
                eng.submit(reqs[nxt])
                nxt += 1
            if not (eng.pending or eng.prefilling or eng.num_active):
                time.sleep(min(max(arrive[nxt] - now, 0.0), 0.05))
                continue
            comps.extend(eng.step())
    else:
        comps = eng.run(make_reqs(args.requests))
    wall = time.perf_counter() - t0
    total_gen = sum(len(c.tokens) for c in comps)
    s = EngineStats(
        prefill_tokens=eng.stats.prefill_tokens - base.prefill_tokens,
        prefix_cached_tokens=(eng.stats.prefix_cached_tokens
                              - base.prefix_cached_tokens),
        spec_proposed=eng.stats.spec_proposed - base.spec_proposed,
        spec_accepted=eng.stats.spec_accepted - base.spec_accepted,
        decode_tokens=eng.stats.decode_tokens - base.decode_tokens,
        engine_steps=eng.stats.engine_steps - base.engine_steps,
        prefill_s=eng.stats.prefill_s - base.prefill_s,
        decode_s=eng.stats.decode_s - base.decode_s,
        ttft_s=eng.stats.ttft_s[n_ttft_base:],
    )
    mode = (f"open-loop Poisson {args.arrival_rate} req/s"
            if args.arrival_rate else "closed burst")
    print(f"serve-bench [{args.model}]: {len(comps)} requests "
          f"({mode}), {total_gen} tokens in {wall:.2f} s wall")
    print(f"  decode: {s.decode_tokens} tok in {s.decode_s:.2f} s = "
          f"{s.decode_tokens_per_s:.1f} tok/s/chip "
          f"(batch {args.batch}, steps {s.engine_steps})")
    # Chunked prefill dispatches enqueue asynchronously; their device
    # time drains inside later sync points, so the per-component rate
    # is an ENQUEUE rate, not device throughput (wall time and TTFT are
    # the honest end-to-end numbers; FA_TPU_SYNC_STEPS=1 forces
    # per-dispatch attribution).
    async_note = (", async-attributed"
                  if args.prefill_chunk and not os.environ.get(
                      "FA_TPU_SYNC_STEPS") else "")
    print(f"  prefill: {s.prefill_tokens} tok in {s.prefill_s:.2f} s = "
          f"{s.prefill_tokens / max(s.prefill_s, 1e-9):.0f} tok/s"
          + (f" (chunked, {args.prefill_chunk} tok/chunk{async_note})"
             if args.prefill_chunk else ""))
    if args.prefix_cache:
        tot = s.prefill_tokens + s.prefix_cached_tokens
        print(f"  prefix cache: {s.prefix_cached_tokens} of {tot} "
              f"prompt tok served from cache "
              f"({100.0 * s.prefix_cached_tokens / max(tot, 1):.0f}%)")
    if args.spec_k:
        dispatches = s.spec_proposed / max(args.spec_k, 1)
        print(f"  speculative: {s.spec_accepted}/{s.spec_proposed} "
              f"drafts accepted "
              f"({100.0 * s.spec_accepted / max(s.spec_proposed, 1):.0f}%"
              f"), {s.decode_tokens / max(dispatches, 1):.2f} "
              f"tok/dispatch")
    pct = s.ttft_percentiles()
    if pct:
        # p50 TTFT is a named driver metric (BASELINE.json).
        print(f"  TTFT: p50 {pct['p50'] * 1e3:.0f} ms  "
              f"p90 {pct['p90'] * 1e3:.0f} ms  "
              f"p99 {pct['p99'] * 1e3:.0f} ms  "
              f"({len(s.ttft_s)} requests)")
    win = f", window={cfg.window}" if cfg.window else ""
    print(f"  pages: peak {eng.stats.peak_pages} of {args.num_pages} "
          f"in use ({eng.stats.peak_pages * args.page_size} tokens"
          f"{win})")
    if args.trace and eng.trace:
        by_kind: dict = {}
        for _, dur, kind, *_ in eng.trace:
            c, t = by_kind.get(kind, (0, 0.0))
            by_kind[kind] = (c + 1, t + dur)
        acct = sum(t for _, t in by_kind.values())
        print(f"  trace: {len(eng.trace)} steps, {acct:.2f} s in-step "
              f"of {wall:.2f} s wall; admit "
              f"{eng.stats.admit_s - base.admit_s:.2f} s, flush "
              f"{eng.stats.flush_s - base.flush_s:.2f} s, book "
              f"{eng.stats.book_s - base.book_s:.2f} s")
        for kind, (c, t) in sorted(by_kind.items(),
                                   key=lambda kv: -kv[1][1]):
            print(f"    {kind:14s} {c:5d} steps  {t:7.2f} s  "
                  f"({t / c * 1e3:7.1f} ms/step)")
        worst = sorted(eng.trace, key=lambda e: -e[1])[:5]
        for t_s, dur, kind, nlive, npend, npre in worst:
            print(f"    slow: +{t_s - t0:7.2f}s {kind:14s} "
                  f"{dur * 1e3:8.1f} ms  live={nlive} pend={npend} "
                  f"prefilling={npre}")
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
    pp.add_argument("--kv-heads", type=int, default=None,
                    help="GQA: number of KV heads (default = q heads)")
    pp.add_argument("--causal", action="store_true")
    pp.add_argument("--warmup", type=int, default=3)
    pp.add_argument("--iters", type=int, default=5)
    pp.add_argument("--profile", default=None)
    pp.add_argument("--bwd", action="store_true",
                    help="also time the fwd+bwd step")
    pp.set_defaults(fn=cmd_perf)

    pm = sub.add_parser("max-batch", help="OOM binary search over batch")
    pm.add_argument("--config", default="1,32,8192,128")
    pm.add_argument("--dtype", default="bfloat16")
    pm.add_argument("--causal", action="store_true")
    pm.add_argument("--bwd", action="store_true")
    pm.add_argument("--limit", type=int, default=4096)
    pm.set_defaults(fn=cmd_max_batch)

    pd = sub.add_parser("decode-bench",
                        help="paged decode kernel / model tokens-per-s")
    pd.add_argument("--batch", type=int, default=64)
    pd.add_argument("--q-heads", type=int, default=32)
    pd.add_argument("--kv-heads", type=int, default=8)
    pd.add_argument("--head-dim", type=int, default=128)
    pd.add_argument("--context", type=int, default=4096)
    pd.add_argument("--page-size", type=int, default=256)
    pd.add_argument("--kv-dtype", default="bfloat16",
                    choices=["bfloat16", "int8", "fp8", "fp8_e5m2"])
    pd.add_argument("--fold-scales", action="store_true",
                    help="int8-only kernel variant folding dequant "
                         "scales around the MXU (measured +3%%; see "
                         "ops/paged.py docstring)")
    pd.add_argument("--model", default=None,
                    choices=[None, "tiny", "1b", "8b", "mixtral"])
    pd.add_argument("--model-layers", type=int, default=None,
                    help="override n_layers (bench-what-fits for "
                         "capacity-limited models, e.g. mixtral)")
    pd.add_argument("--model-batch", type=int, default=32)
    pd.add_argument("--model-context", type=int, default=2048)
    pd.add_argument("--model-steps", type=int, default=32)
    pd.add_argument("--weight-quant", default=None,
                    choices=[None, "int8", "int4", "fp8"])
    pd.add_argument("--model-kv", default=None,
                    choices=[None, "none", "int8", "fp8", "fp8_e5m2"])
    pd.add_argument("--warmup", type=int, default=3)
    pd.add_argument("--iters", type=int, default=10)
    pd.set_defaults(fn=cmd_decode_bench)

    pmo = sub.add_parser("moe-bench",
                         help="grouped vs one-hot expert MLP throughput")
    pmo.add_argument("--dim", type=int, default=4096)
    pmo.add_argument("--ffn-dim", type=int, default=14336)
    pmo.add_argument("--experts", type=int, default=8)
    pmo.add_argument("--top-k", type=int, default=2)
    pmo.add_argument("--tokens", type=int, nargs="+",
                     default=[2048, 8192])
    pmo.add_argument("--weight-quants", nargs="*",
                     default=["int8", "int4"],
                     choices=["int8", "int4"])
    pmo.add_argument("--warmup", type=int, default=2)
    pmo.add_argument("--iters", type=int, default=5)
    pmo.set_defaults(fn=cmd_moe_bench)

    pt = sub.add_parser("train-bench",
                        help="train-step tokens/s + MFU on one chip")
    pt.add_argument("--model", default="1b",
                    choices=list(_PRESETS))
    pt.add_argument("--moe", action="store_true",
                    help="MoE variant of the preset (8 experts, top-2)")
    pt.add_argument("--batch", type=int, default=4)
    pt.add_argument("--seq", type=int, default=2048)
    pt.add_argument("--steps", type=int, default=8)
    pt.add_argument("--remat", action="store_true", default=True)
    pt.add_argument("--no-remat", dest="remat", action="store_false")
    pt.add_argument("--peak-tflops", type=float, default=197.0)
    pt.set_defaults(fn=cmd_train_bench)

    ps_ = sub.add_parser("serve-bench", help="engine end-to-end tokens/s")
    ps_.add_argument("--model", default="1b",
                     choices=["tiny", "1b", "8b", "mistral"])
    ps_.add_argument("--model-layers", type=int, default=None,
                     help="override n_layers (reduced-depth artifact "
                          "configs)")
    ps_.add_argument("--batch", type=int, default=16)
    ps_.add_argument("--requests", type=int, default=32)
    ps_.add_argument("--prompt-len", type=int, default=512)
    ps_.add_argument("--gen-len", type=int, default=64)
    ps_.add_argument("--num-pages", type=int, default=512)
    ps_.add_argument("--page-size", type=int, default=256)
    ps_.add_argument("--kv-quant", default=None,
                     choices=[None, "none", "int8", "fp8"])
    ps_.add_argument("--weight-quant", default=None,
                     choices=[None, "int8", "int4", "fp8"])
    ps_.add_argument("--decode-chunk", type=int, default=8)
    ps_.add_argument("--prefill-chunk", type=int, default=None,
                     help="interleave prompt prefill with decode in "
                          "chunks of this many tokens (TTFT path)")
    ps_.add_argument("--spec-k", type=int, default=0,
                     help="speculative decoding: n-gram prompt-lookup "
                          "drafts of this depth, verified in one "
                          "multi-token dispatch (greedy only)")
    ps_.add_argument("--spec-rounds", type=int, default=1,
                     help="fuse this many draft+verify rounds per "
                          "dispatch (requires a draft model via "
                          "--draft-dim/--draft-load)")
    ps_.add_argument("--prefix-cache", action="store_true",
                     help="automatic prefix caching (cached prompt "
                          "pages reused; suffix-only prefill)")
    ps_.add_argument("--shared-prefix", type=int, default=0,
                     help="tokens of common system prompt across "
                          "requests (prefix-cache workload)")
    ps_.add_argument("--arrival-rate", type=float, default=None,
                     help="open-loop Poisson arrival rate (req/s); "
                          "default is a closed burst of --requests")
    ps_.add_argument("--trace", action="store_true",
                     help="print a per-step wall-time breakdown "
                          "(kind histogram + slowest steps)")
    ps_.add_argument("--window", type=int, default=None,
                     help="sliding-window override for the preset "
                          "(positions per layer each query can see)")
    ps_.add_argument("--spec-oracle", type=float, default=None,
                     metavar="P",
                     help="draft from a pre-computed greedy transcript "
                          "with per-token survival prob P (mechanism "
                          "benchmark: acceptance as a controlled knob); "
                          "requires --spec-k")
    ps_.add_argument("--load", default=None,
                     help="load MAIN weights from a safetensors "
                          "file/dir (HF Llama layout; composes with "
                          "--weight-quant as quantize-on-load)")
    ps_.add_argument("--draft-load", default=None,
                     help="model-based drafting: load the DRAFT model "
                          "from safetensors (requires --spec-k and the "
                          "--draft-* shape flags)")
    ps_.add_argument("--draft-dim", type=int, default=None,
                     help="draft model width (enables model-based "
                          "drafts; random init unless --draft-load)")
    ps_.add_argument("--draft-layers", type=int, default=4)
    ps_.add_argument("--draft-heads", type=int, default=8)
    ps_.add_argument("--draft-kv-heads", type=int, default=8)
    ps_.add_argument("--draft-ffn", type=int, default=2048)
    ps_.add_argument("--corpus", default=None, metavar="chain:SIZE",
                     help="prompt workload: 'chain:N' walks the fixed "
                          "seed-1234 permutation over the first N token "
                          "ids (the structured language "
                          "scripts/train_spec_pair.py trains on) "
                          "instead of uniform-random prompts")
    ps_.set_defaults(fn=cmd_serve_bench)

    pf = sub.add_parser("profile",
                        help="XLA cost/memory analysis + XProf trace")
    pf.add_argument("--config", default="1,32,8192,128")
    pf.add_argument("--dtype", default="bfloat16")
    pf.add_argument("--causal", action="store_true")
    pf.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak for utilization (v5e bf16 ~197)")
    pf.add_argument("--warmup", type=int, default=3)
    pf.add_argument("--iters", type=int, default=5)
    pf.add_argument("--profile", default=None,
                    help="directory for an XProf trace capture")
    pf.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    try:
        if hasattr(args, "configs"):
            args.configs = _parse_configs(args.configs)
        if hasattr(args, "config"):
            args.config = _parse_configs([args.config])[0]
    except (argparse.ArgumentTypeError, ValueError) as e:
        p.error(str(e))            # clean usage error, exit 2
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
