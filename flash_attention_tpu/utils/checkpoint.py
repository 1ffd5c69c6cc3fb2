"""Checkpoint / resume for training state.

Auxiliary subsystem the reference lacks entirely (SURVEY.md §5:
"Checkpoint / resume: none — `ctx.save_for_backward` is the only state
persistence"). TPU-native implementation on Orbax: async-capable,
sharding-aware (restores distributed arrays to their mesh placement),
with a step-indexed directory layout and retention policy.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import jax


def _manager(ckpt_dir, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        pathlib.Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir, step: int, state: Any, *,
                    max_to_keep: int = 3, blocking: bool = True) -> None:
    """Save a pytree `state` (params / opt_state / rng / metadata) at
    `step`. Retains the newest `max_to_keep` steps."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if blocking:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir) -> int | None:
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir, *, step: int | None = None,
                       template: Any = None) -> tuple[int, Any]:
    """Restore (step, state). With `template` (a pytree of like-shaped
    arrays or jax.ShapeDtypeStruct with shardings), arrays restore
    directly to their devices/mesh placement."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    if template is not None:
        ref = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        state = mgr.restore(step, args=ocp.args.StandardRestore(ref))
    else:
        state = mgr.restore(step)
    mgr.close()
    return step, state
