from flash_attention_tpu.parallel.mesh import make_mesh, mesh_shape_for
from flash_attention_tpu.parallel.ring import make_ring_attention, ring_attention

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ring_attention",
    "make_ring_attention",
]
