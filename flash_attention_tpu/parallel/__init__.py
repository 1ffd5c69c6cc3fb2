from flash_attention_tpu.parallel.mesh import make_mesh, mesh_shape_for
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
]
