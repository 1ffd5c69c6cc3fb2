"""flash_attention_tpu — a TPU-native flash-attention framework.

A from-scratch JAX / Pallas / pjit framework with the capabilities of the
reference CUDA/CUTLASS/Triton study (`santiweide/flash-attention-impls`,
see /root/repo/SURVEY.md): exact naive attention references, FA1- and
FA2-style tiled online-softmax forward kernels with a VMEM-budget tile
autotuner, MXU-accelerated attention tiles, FA2-style recompute backward
with `jax.custom_vjp`, causal masking and GQA/MQA, plus verification and
benchmarking harnesses — extended with quantized (INT8/FP8) KV caches,
paged continuous-batching decode, and mesh/ring-attention scaling that the
reference lacks.

Layering (bottom-up):
    utils/      error metrics, timing/benchmark helpers, profiling hooks
    config.py   block-size (tile) selection against the VMEM budget
    ops/        the kernels: reference, naive-pallas, FA1, FA2 fwd+bwd,
                decode, quantized-KV, paged attention
    parallel/   device mesh + ring attention (sequence parallelism)
    models/     Llama-class flagship model using the ops
    runtime/    KV-cache management (C++ block allocator), serving loop
"""

from flash_attention_tpu.ops.reference import attention_reference, attention_baseline
from flash_attention_tpu.ops.flash import (
    SegmentIds,
    flash_attention,
    flash_attention_quantized,
)
from flash_attention_tpu.ops.quant import QuantizedTensor, dequantize_kv, quantize_kv
from flash_attention_tpu.config import BlockSizes, select_block_sizes

__version__ = "0.1.0"

__all__ = [
    "attention_reference",
    "attention_baseline",
    "flash_attention",
    "flash_attention_quantized",
    "SegmentIds",
    "QuantizedTensor",
    "quantize_kv",
    "dequantize_kv",
    "BlockSizes",
    "select_block_sizes",
    "__version__",
]
