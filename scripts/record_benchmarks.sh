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
