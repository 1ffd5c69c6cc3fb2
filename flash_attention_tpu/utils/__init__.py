from flash_attention_tpu.utils.data import (
    BatchLoader,
    TokenShardDataset,
    write_token_shard,
)
from flash_attention_tpu.utils.metrics import (
    symmetric_relative_error,
    max_abs_error,
    verify,
    VerifyReport,
)

__all__ = [
    "BatchLoader",
    "TokenShardDataset",
    "write_token_shard",
    "symmetric_relative_error",
    "max_abs_error",
    "verify",
    "VerifyReport",
]
