#!/usr/bin/env bash
# Round-5 remainder, reordered for a tight wall clock: the REPORT-cited
# spec-model serving artifacts first, then the decode-roofline probes,
# headline bench last. Logs to /tmp/r5_<step>.log like the main script.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

step() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" > "/tmp/r5_$name.log" 2>&1
    echo "    rc=$? (log /tmp/r5_$name.log)"
}

step train_spec_pair 2400 python scripts/train_spec_pair.py \
    --out-main /tmp/spec_main.safetensors \
    --out-draft /tmp/spec_draft.safetensors
step spec_model_baseline 1500 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 2>&1 | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_baseline'
step spec_model_ngram 1500 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 2>&1 \
    | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_ngram'
step spec_model_model 2000 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 --spec-rounds 2 --draft-dim 512 \
    --draft-layers 4 --draft-heads 8 --draft-kv-heads 8 \
    --draft-ffn 2048 --draft-load /tmp/spec_draft.safetensors 2>&1 \
    | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_model'

step probe_decomp     1800 python scripts/probe_decode_decomp.py
step probe_split      1500 python scripts/probe_split_causal.py
step probe_paged_int8 1500 python scripts/probe_paged_int8.py
step probe_lmhead     1500 python scripts/probe_lmhead_argmax.py
step probe_int4       1500 python scripts/probe_int4_variants.py
step probe_cliff      1500 python scripts/probe_prefill_cliff.py

step bench_py 1200 python bench.py
echo "=== takeover done ($(date -u +%H:%M:%S)) ==="
