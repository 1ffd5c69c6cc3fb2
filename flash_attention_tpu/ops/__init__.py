from flash_attention_tpu.ops.reference import attention_reference, attention_baseline
from flash_attention_tpu.ops.flash import flash_attention, flash_attention_fwd

__all__ = [
    "attention_reference",
    "attention_baseline",
    "flash_attention",
    "flash_attention_fwd",
]
