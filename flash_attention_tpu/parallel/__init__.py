from flash_attention_tpu.parallel.mesh import make_mesh, mesh_shape_for
from flash_attention_tpu.parallel.pipeline import (
    make_pp_loss,
    make_pp_train_step,
    merge_pipeline_params,
    pipeline_shardings,
    split_pipeline_params,
)
from flash_attention_tpu.parallel.ring import (
    make_ring_attention,
    ring_attention,
    zigzag_inverse,
    zigzag_order,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ring_attention",
    "make_ring_attention",
    "zigzag_order",
    "zigzag_inverse",
    "make_pp_train_step",
    "make_pp_loss",
    "split_pipeline_params",
    "merge_pipeline_params",
    "pipeline_shardings",
]
