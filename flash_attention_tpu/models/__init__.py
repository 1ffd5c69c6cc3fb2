from flash_attention_tpu.models.llama import (
    LlamaConfig,
    init_params,
    forward,
    loss_fn,
    make_train_step,
    param_shardings,
)
from flash_attention_tpu.models.moe import (
    MoEConfig,
    init_moe_params,
    make_moe_train_step,
    moe_forward,
    moe_loss_fn,
    moe_param_shardings,
)

__all__ = [
    "LlamaConfig",
    "init_params",
    "forward",
    "loss_fn",
    "make_train_step",
    "param_shardings",
    "MoEConfig",
    "init_moe_params",
    "moe_forward",
    "moe_loss_fn",
    "make_moe_train_step",
    "moe_param_shardings",
]
