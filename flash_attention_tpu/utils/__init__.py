from flash_attention_tpu.utils.metrics import (
    symmetric_relative_error,
    max_abs_error,
    verify,
    VerifyReport,
)

__all__ = [
    "symmetric_relative_error",
    "max_abs_error",
    "verify",
    "VerifyReport",
]
