from flash_attention_tpu.models.llama import (
    LlamaConfig,
    init_params,
    forward,
    loss_fn,
    make_train_step,
    param_shardings,
)

__all__ = [
    "LlamaConfig",
    "init_params",
    "forward",
    "loss_fn",
    "make_train_step",
    "param_shardings",
]
