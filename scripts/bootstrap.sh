#!/usr/bin/env bash
# Environment bootstrap + smoke run (role of run/build_and_run.sh:1-118,
# which module-loads CUDA, autodetects the GPU arch, builds, and runs).
# The TPU equivalent: detect the TPU platform/topology through JAX,
# build the native allocator, run the verification CLI once.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== flash-attention-tpu bootstrap =="

# 1. Toolchain + native allocator (the reference's `make` step).
if command -v make >/dev/null && command -v g++ >/dev/null; then
    make -C flash_attention_tpu/runtime/native
    echo "native allocator: built"
else
    echo "native allocator: no C++ toolchain, using Python fallback"
fi

# 2. Topology autodetect (the reference's nvidia-smi -> -arch mapping,
#    build_and_run.sh:27-46).
python - <<'EOF'
import jax
devs = jax.devices()
kinds = sorted({d.device_kind for d in devs})
print(f"platform:        {jax.default_backend()}")
print(f"devices:         {len(devs)} x {', '.join(kinds)}")
print(f"local devices:   {jax.local_device_count()}")
print(f"process count:   {jax.process_count()}")
for d in devs[:8]:
    coords = getattr(d, "coords", None)
    print(f"  {d.id}: {d.device_kind}" + (f" coords={coords}" if coords else ""))
if jax.default_backend() != "tpu":
    print("NOTE: no TPU visible - kernels will run in interpreter mode")
EOF

# 3. Smoke verify + benchmark (the reference's run step).
python -m flash_attention_tpu.cli verify 1 8 512 64 4096 50 --dtype bfloat16
