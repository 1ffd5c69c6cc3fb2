#!/usr/bin/env bash
# Record benchmark artifacts (role of the reference's checked-in
# run/perf_* logs, SURVEY.md C26): one captured stdout file per config
# under benchmarks/, named perf_B_H_N_D like the reference's.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks

run() {
    local b=$1 h=$2 n=$3 d=$4; shift 4
    local out="benchmarks/perf_${b}_${h}_${n}_${d}"
    echo "=== recording $out ==="
    timeout 1200 python -m flash_attention_tpu.cli compare \
        --configs "$b,$h,$n,$d" --dtype bfloat16 "$@" 2>&1 \
        | grep -v "Platform 'axon' is experimental" | tee "$out"
}

# Reference sweep: perf_1_1_{512..8192}_{32,64} (test_flash_attn.cu:854-866)
for n in 512 1024 2048 4096 8192; do
    for d in 32 64; do
        run 1 1 "$n" "$d" --warmup 3 --iters 5
    done
done
# Flagship configs: perf_1_32_8192_{32,64,128}, perf_2_32_8192_128
for d in 32 64 128; do
    run 1 32 8192 "$d" --warmup 2 --iters 3
done
run 2 32 8192 128 --warmup 2 --iters 3
echo "done."

# --- round-2 artifacts ------------------------------------------------------

# KV-dtype decode ladder (kernel level, incl. the fp8 bit-plant rows)
{
echo "# paged decode kernel, batch=64 Hq=32 Hkv=8 D=128 ctx=4096 page=256"
for dt in bfloat16 int8 fp8 fp8_e5m2; do
    timeout 900 python -m flash_attention_tpu.cli decode-bench \
        --kv-dtype "$dt" --warmup 2 --iters 6 2>&1 \
        | grep -v "Platform 'axon'" | grep -E "attention decode" \
        | sed "s/^/$dt: /"
done
} > benchmarks/decode_bench_kv_dtypes

# 8B decode: int8 weights + fp8/int8 KV (driver metric: tokens/s at 8B FP8-KV)
timeout 1500 python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int8 --model-kv fp8 --model-batch 16 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/bench_8b_fp8
timeout 1500 python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int8 --model-kv int8 --model-batch 16 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/bench_8b_int8_r2

timeout 1800 python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant fp8 --model-kv fp8 --model-batch 16 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/bench_8b_full_fp8

timeout 1800 python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int4 --model-kv fp8 --model-batch 32 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/bench_8b_int4_b32
timeout 1800 python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int4 --model-kv int8 --model-batch 32 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/bench_8b_int4_int8_b32

# Sequence sweep 2K->128K causal GQA (driver metric: TFLOP/s at seq 2K-128K)
timeout 1500 python -m flash_attention_tpu.cli perf \
    --configs 8,32,2048,128 1,32,2048,128 1,32,8192,128 1,32,32768,128 \
    1,32,131072,128 \
    --kv-heads 8 --causal --warmup 2 --iters 4 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/seq_sweep

# Backward artifacts (dq/dkv independently tuned blocks)
timeout 1200 python -m flash_attention_tpu.cli perf --configs 1,32,8192,128 \
    --causal --bwd --warmup 2 --iters 4 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/perf_bwd
timeout 1200 python -m flash_attention_tpu.cli perf --configs 1,32,8192,128 \
    --bwd --warmup 2 --iters 4 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/perf_bwd_noncausal

# Serve benches: chunked-prefill TTFT vs monolithic (driver metric: p50 TTFT)
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 48 --prompt-len 512 --gen-len 48 \
    --decode-chunk 24 --prefill-chunk 256 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_ttft
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 48 --prompt-len 512 --gen-len 48 \
    --decode-chunk 24 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_monolithic

# Prefix-cache pair: shared 384-token system prompt, cached vs not
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 48 --prompt-len 512 --gen-len 48 \
    --decode-chunk 24 --shared-prefix 384 --prefix-cache 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_prefix_cache
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 48 --prompt-len 512 --gen-len 48 \
    --decode-chunk 24 --shared-prefix 384 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_prefix_off

# Open-loop Poisson arrivals (the headline serving-latency methodology:
# closed bursts measure queue depth, not the engine) at three rates.
# 128 pages bounds the pool transfer (the 512-page/8.6 GB allocation
# occasionally wedges on the tunneled transport); peak occupancy for
# this workload is ~33 pages either way.
for rate in 4 8 16; do
    timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
        --batch 16 --requests 64 --prompt-len 512 --gen-len 48 \
        --num-pages 128 --decode-chunk 24 --prefill-chunk 256 \
        --arrival-rate "$rate" 2>&1 \
        | grep -v "Platform 'axon'" \
        | tee "benchmarks/serve_bench_1b_openloop_r$rate"
done

# Speculative-decode cost pair: k=3 verify vs single-token dispatch
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --spec-k 3 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_spec
# Speculation speedup-vs-acceptance curve (oracle drafts from a
# pre-computed transcript; acceptance is a controlled knob — n-gram
# acceptance on random-weight text stays ~3%, a workload property)
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 --spec-oracle 1.0 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_spec_oracle
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 --spec-oracle 0.7 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_spec_oracle70
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --decode-chunk 1 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_chunk1

# Model-based drafting on the chain-corpus workload (trained main +
# tiny draft pair): n-gram lookup gets ~0% there while the trained
# draft carries the global next-token function. Train once (exports
# /tmp/spec_{main,draft}.safetensors), then three measured rows on the
# SAME weights/workload: chunked baseline, n-gram spec, model drafts
# with fused rounds.
timeout 3000 python scripts/train_spec_pair.py \
    --out-main /tmp/spec_main.safetensors \
    --out-draft /tmp/spec_draft.safetensors 2>&1 \
    | grep -v "Platform 'axon'" | tail -20
for row in baseline ngram model; do
    case "$row" in
        baseline) extra="" ;;
        ngram)    extra="--spec-k 3" ;;
        model)    extra="--spec-k 3 --spec-rounds 2 --draft-dim 512
                         --draft-layers 4 --draft-heads 8
                         --draft-kv-heads 8 --draft-ffn 2048
                         --draft-load /tmp/spec_draft.safetensors" ;;
    esac
    timeout 1800 python -m flash_attention_tpu.cli serve-bench \
        --model 1b --load /tmp/spec_main.safetensors \
        --corpus chain:4096 --batch 16 --requests 32 \
        --prompt-len 256 --gen-len 48 --num-pages 128 \
        $extra 2>&1 \
        | grep -v "Platform 'axon'" \
        | tee "benchmarks/serve_bench_1b_spec_model_$row"
done

# 8B end-to-end ENGINE serving on one chip (int4 weights + int8 pools)
timeout 1800 python -m flash_attention_tpu.cli serve-bench --model 8b \
    --weight-quant int4 --kv-quant int8 --batch 16 --requests 32 \
    --prompt-len 512 --gen-len 32 --num-pages 280 --page-size 256 \
    --decode-chunk 8 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_8b_int4

# Windowed serving at long context: page occupancy must be O(window)
# (65 of 96 pages for 4 live 16K-context seqs at window 4096 vs ~260
# full-causal)
timeout 1400 python -m flash_attention_tpu.cli serve-bench --model 1b \
    --window 4096 --batch 4 --requests 8 --prompt-len 16384 \
    --gen-len 32 --num-pages 96 --page-size 256 --prefill-chunk 1024 \
    --decode-chunk 8 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/serve_bench_1b_16k_window4k

# Long-context prefill 32K/128K + int8-KV row (BASELINE config 5, one chip)
timeout 1200 python scripts/record_long_context.py 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/long_context_prefill

# Model-level training throughput (1B, one chip)
timeout 1400 python -m flash_attention_tpu.cli train-bench --model 1b \
    --batch 4 --seq 2048 --steps 8 2>&1 \
    | grep -v "Platform 'axon'" | tee benchmarks/train_bench_1b
