#!/usr/bin/env bash
# Round-5 TPU measurement session: runs the queued on-chip work in
# dependency order the moment the tunnel is back. Each step logs to
# /tmp/r5_<step>.log and failures don't stop later steps.
set -u
cd "$(dirname "$0")/.."
# Preserve any pre-set entries (the TPU plugin registers via a
# sitecustomize dir already on PYTHONPATH — overwriting it kills the
# 'axon' backend registration).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

step() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date -u +%H:%M:%S)) ==="
    timeout "$tmo" "$@" > "/tmp/r5_$name.log" 2>&1
    echo "    rc=$? (log /tmp/r5_$name.log)"
}

# 0. liveness
step liveness 120 python -c "import jax, numpy as np; x = jax.numpy.ones(4); print(np.asarray(jax.device_get(x.ravel()[:1]))); print(jax.devices())"
grep -q "TPU" /tmp/r5_liveness.log || { echo "TPU not reachable; abort"; exit 1; }

# 1. verify drive (kernel + quick gates on the real chip)
step verify_drive 600 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
import flash_attention_tpu as fat
from flash_attention_tpu.ops.reference import attention_lowp_baseline
from flash_attention_tpu.utils.metrics import verify, verify_low_precision
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(42)
mk = lambda shp, dt: jnp.asarray(rng.normal(0, 0.02, shp), dt)
q, k, v = mk((2,8,1024,128), jnp.bfloat16), mk((2,2,1024,128), jnp.bfloat16), mk((2,2,1024,128), jnp.bfloat16)
o = fat.flash_attention(q, k, v, causal=True)
ok, ke, be = verify_low_precision(o, fat.attention_reference(q,k,v,causal=True),
                                  attention_lowp_baseline(q,k,v,causal=True))
assert ok, (ke, be)
q32, k32, v32 = mk((1,2,512,64), jnp.float32), mk((1,2,512,64), jnp.float32), mk((1,2,512,64), jnp.float32)
r = verify(fat.flash_attention(q32,k32,v32), fat.attention_reference(q32,k32,v32))
assert r.passed, str(r)
g = jax.grad(lambda q,k,v: jnp.sum(fat.flash_attention(q,k,v,causal=True).astype(jnp.float32)**2), (0,1,2))(q,k,v)
assert all(bool(jnp.isfinite(x.astype(jnp.float32)).all()) for x in g)
# split fwd on-chip exactness
from flash_attention_tpu.ops.flash import flash_attention_fwd, flash_attention_fwd_split
qq, kk, vv = mk((1,4,4096,128), jnp.bfloat16), mk((1,4,4096,128), jnp.bfloat16), mk((1,4,4096,128), jnp.bfloat16)
w1, _ = flash_attention_fwd(qq, kk, vv, causal=True, save_residuals=False)
w2, _ = flash_attention_fwd_split(qq, kk, vv, band=2048)
err = float(jnp.max(jnp.abs(w1.astype(jnp.float32) - w2.astype(jnp.float32))))
assert err < 5e-3, err
print("TPU drive OK, split maxabs", err)
EOF

# 3. regenerate the stale 8B artifacts (honest param labels) — task 2
step bench_8b_int4_b32 1800 bash -c '
python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int4 --model-kv fp8 --model-batch 32 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform '\''axon'\''" | tee benchmarks/bench_8b_int4_b32'
step bench_8b_int4_int8_b32 1800 bash -c '
python -m flash_attention_tpu.cli decode-bench --model 8b \
    --weight-quant int4 --model-kv int8 --model-batch 32 \
    --model-context 4096 --model-steps 32 --iters 6 2>&1 \
    | grep -v "Platform '\''axon'\''" | tee benchmarks/bench_8b_int4_int8_b32'
step decode_bench_1b 1800 bash -c '
{ for dt in bfloat16 int8 fp8 fp8_e5m2; do
    python -m flash_attention_tpu.cli decode-bench --batch 64 \
        --q-heads 32 --kv-heads 8 --head-dim 128 --context 4096 \
        --page-size 256 --kv-dtype "$dt" --iters 8 2>&1 \
        | grep -v "Platform '\''axon'\''" | sed "s/^/$dt: /"
  done
  python -m flash_attention_tpu.cli decode-bench --model 1b \
      --model-batch 32 --model-context 2048 --model-steps 32 \
      --iters 6 2>&1 | grep -v "Platform '\''axon'\''"
} | tee benchmarks/decode_bench_1b'

# 2. decomposition + kernel variants + prefill cliff + split perf
step probe_decomp     2400 python scripts/probe_decode_decomp.py
step probe_int4       1800 python scripts/probe_int4_variants.py
step probe_paged_int8 1800 python scripts/probe_paged_int8.py
step probe_cliff      1800 python scripts/probe_prefill_cliff.py
step probe_split      1800 python scripts/probe_split_causal.py
step probe_lmhead     1800 python scripts/probe_lmhead_argmax.py

# 4. trained spec pair + the three serving rows
step train_spec_pair 3000 python scripts/train_spec_pair.py \
    --out-main /tmp/spec_main.safetensors \
    --out-draft /tmp/spec_draft.safetensors
step spec_model_baseline 1800 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 2>&1 | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_baseline'
step spec_model_ngram 1800 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 2>&1 \
    | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_ngram'
step spec_model_model 2400 bash -c '
python -m flash_attention_tpu.cli serve-bench --model 1b \
    --load /tmp/spec_main.safetensors --corpus chain:4096 \
    --batch 16 --requests 32 --prompt-len 256 --gen-len 48 \
    --num-pages 128 --spec-k 3 --spec-rounds 2 --draft-dim 512 \
    --draft-layers 4 --draft-heads 8 --draft-kv-heads 8 \
    --draft-ffn 2048 --draft-load /tmp/spec_draft.safetensors 2>&1 \
    | grep -v "Platform '\''axon'\''" \
    | tee benchmarks/serve_bench_1b_spec_model_model'

# 5. headline sanity
step bench_py 1200 python bench.py
echo "=== session done ($(date -u +%H:%M:%S)) ==="
