"""Device-mesh construction.

The TPU-native scaling substrate (SURVEY.md §5: the reference has no
distributed layer at all — this is the role NCCL/MPI would have played
had it scaled out). Axis conventions, in mesh-major order:

  dp    data parallel (batch) — gradients all-reduce over ICI/DCN
  pp    pipeline parallel (layer stages; microbatch activations ppermute)
  fsdp  fully-sharded data parallel (params + optimizer state sharded)
  sp    sequence parallel (ring attention rotates KV around this axis)
  tp    tensor parallel (heads / hidden sharded; activations collective)
  ep    expert parallel (MoE experts sharded; token all_to_all dispatch)

Multi-host: call `initialize_distributed()` (below) before mesh
creation; it wires `jax.distributed` so `jax.devices()` spans hosts,
and the same mesh code then lays axes across ICI within a slice and
DCN between slices (dp/fsdp outermost so the slow axis carries only
gradient reductions). `scripts/launch_multihost.py` is the per-host
launcher; `tests/test_multihost.py` exercises the real 2-process path
on CPU (gloo-backed cross-process collectives).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


AXES = ("dp", "pp", "fsdp", "sp", "tp", "ep")


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> None:
    """Bootstrap multi-host JAX. Call ONCE per process, before any
    backend touch (device queries pin the local-only backend).

    On Cloud TPU pods every argument auto-detects from the metadata
    server — call with no arguments. Elsewhere (CPU/GPU clusters, the
    gloo-backed CPU test rig) pass the coordinator explicitly, or set
    FA_TPU_COORDINATOR / FA_TPU_NUM_PROCESSES / FA_TPU_PROCESS_ID (the
    contract `scripts/launch_multihost.py` uses). No-op if the process
    is already initialized or the run is single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "FA_TPU_COORDINATOR")
    if num_processes is None and "FA_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FA_TPU_NUM_PROCESSES"])
    if process_id is None and "FA_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FA_TPU_PROCESS_ID"])
    if num_processes == 1:
        return
    already = getattr(jax._src.distributed.global_state, "client", None)
    if already is not None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def mesh_shape_for(n_devices: int, *, dp=1, pp=1, fsdp=1, sp=1, tp=1,
                   ep=1) -> dict:
    """Fill in at most one -1 axis to consume the remaining devices."""
    shape = {"dp": dp, "pp": pp, "fsdp": fsdp, "sp": sp, "tp": tp, "ep": ep}
    free = [k for k, v in shape.items() if v == -1]
    if len(free) > 1:
        raise ValueError("at most one axis may be -1")
    fixed = int(np.prod([v for v in shape.values() if v != -1]))
    if free:
        if n_devices % fixed:
            raise ValueError(
                f"{n_devices} devices not divisible by fixed axes {fixed}"
            )
        shape[free[0]] = n_devices // fixed
        fixed = n_devices
    if fixed != n_devices:
        raise ValueError(
            f"mesh shape {shape} needs {fixed} devices, have {n_devices}"
        )
    return shape


def make_mesh(*, dp=1, pp=1, fsdp=1, sp=1, tp=1, ep=1,
              devices=None) -> Mesh:
    """Build a Mesh with the standard axes. Use -1 for one auto axis.

    Axis order puts dp/pp outermost (DCN-friendly: gradient reductions
    and point-to-point microbatch handoffs tolerate the slow axis) and
    tp/ep innermost (highest-bandwidth ICI neighbors for the most
    chatty collectives — per-layer psum and token all_to_all).
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    shape = mesh_shape_for(len(devices), dp=dp, pp=pp, fsdp=fsdp, sp=sp,
                           tp=tp, ep=ep)
    dims = tuple(shape[a] for a in AXES)
    if not explicit:
        # Lay axes along the physical ICI torus (enumeration-order
        # reshape puts "neighbors" on non-adjacent chips for 2D/3D
        # slices, silently degrading collective bandwidth).
        try:
            from jax.experimental import mesh_utils
            return Mesh(mesh_utils.create_device_mesh(dims), AXES)
        except Exception:
            pass  # host-platform sims have no topology; fall through
    arr = np.array(devices).reshape(*dims)
    return Mesh(arr, AXES)
