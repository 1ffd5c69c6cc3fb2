"""Implementation registry + head-dim dispatch.

Role of the reference's dispatch layer (`flash_attn_unified.cu:545-617`,
`flash_attn_cutlass.cu:519-544`): one place that maps an implementation
name + head_dim to a callable. On TPU the "template instantiation per
head dim" is a traced-and-cached kernel specialization, so dispatch
reduces to validation + block-size selection; the registry preserves the
reference's study structure (baseline / naive-kernel / fa1 / fa2 /
flagship) for the comparison harness.

`attention_reference_dispatch` aliases the flagship (the reference
aliases its small-tile kernel the same way, flash_attn_unified.cu:604-617).
"""

from __future__ import annotations

from typing import Callable

from flash_attention_tpu.config import SUPPORTED_HEAD_DIMS
from flash_attention_tpu.ops.flash import flash_attention
from flash_attention_tpu.ops.reference import (
    attention_baseline,
    attention_reference,
)
from flash_attention_tpu.ops.variants import (
    flash_attention_fa1,
    flash_attention_fa2_inloop,
    naive_attention_pallas,
)


def _reject_causal(name, kw):
    if kw.pop("causal", False):
        raise ValueError(
            f"{name} is a non-causal study kernel (the CUDA FA1s have no "
            "causal path, SURVEY.md §2.3); use 'flash' or 'fa2_inloop'")
    return kw


def _fa1_o_only(q, k, v, **kw):
    return flash_attention_fa1(q, k, v, **_reject_causal("fa1", kw))[0]


def _fixed_tile(name: str, head_dim: int, block_q: int,
                block_kv: int) -> Callable:
    """Standalone fixed-tile study kernel (C15 role: the reference keeps
    two frozen-tile kernels outside its dispatch path —
    test_flash_attn.cu:654-824 at 16x32/d64, :349-533 at 24x48/d32).
    The TPU analog pins BlockSizes (bypassing the VMEM autotuner) and
    gates the head dim the way those kernels hard-code theirs."""
    from flash_attention_tpu.config import BlockSizes

    bs = BlockSizes(block_q=block_q, block_kv=block_kv)

    def impl(q, k, v, **kw):
        if q.shape[-1] != head_dim:
            raise ValueError(
                f"{name} is fixed to head_dim {head_dim} "
                f"(got {q.shape[-1]}); use 'flash' for dispatched tiles")
        kw.setdefault("block_sizes", bs)
        return flash_attention(q, k, v, **kw)

    return impl


IMPLEMENTATIONS: dict[str, Callable] = {
    # exact XLA baselines (C2/C21 roles)
    "baseline_xla": attention_baseline,
    "reference_exact": attention_reference,
    # Pallas study kernels
    "naive_pallas": lambda q, k, v, **kw: naive_attention_pallas(
        q, k, v, **_reject_causal("naive_pallas", kw)
    ),
    "fa1": _fa1_o_only,
    "fa2_inloop": flash_attention_fa2_inloop,
    # standalone fixed-tile kernels (C15)
    "flash_fixed_d64": _fixed_tile("flash_fixed_d64", 64, 512, 1024),
    "flash_fixed_d32": _fixed_tile("flash_fixed_d32", 32, 512, 2048),
    # flagship
    "flash": flash_attention,
}

# Which impls support the causal flag.
CAUSAL_CAPABLE = {"baseline_xla", "reference_exact", "fa2_inloop", "flash",
                  "flash_fixed_d64", "flash_fixed_d32"}


def get_attention_impl(name: str) -> Callable:
    if name not in IMPLEMENTATIONS:
        raise ValueError(
            f"unknown implementation {name!r}; available: "
            f"{sorted(IMPLEMENTATIONS)}"
        )
    return IMPLEMENTATIONS[name]


def attention_reference_dispatch(q, k, v, **kw):
    """Alias of the flagship kernel (the reference's alias pattern)."""
    return flash_attention(q, k, v, **kw)


def validate_head_dim(head_dim: int) -> None:
    """Runtime head-dim gate (the switch in flash_attn_unified.cu:557-570
    aborts on unsupported dims the same way)."""
    if head_dim not in SUPPORTED_HEAD_DIMS:
        raise ValueError(
            f"Unsupported head_dim {head_dim}; supported: "
            f"{SUPPORTED_HEAD_DIMS}"
        )
